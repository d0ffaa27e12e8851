"""Ground-truth comparison against the reference's own HPSS demo audio.

``/root/reference/hpss_audio/`` ships 22 mp3s — ``sp.mp3``, ``mu.mp3``,
``sp+mu_{-5..20}dB.mp3`` and pre-rendered ``_Harmonic``/``_Percussive``
decompositions — the paper's qualitative evidence, produced by the
pipeline at ``/root/reference/lib/preprocessing.py:404-422`` (the
generating script itself was never committed, SURVEY.md §2.3).  This is
the only real (non-synthetic) audio available in this environment; this
tool decodes it with ``data.codecs.read_mp3`` and validates the rebuild
against it on three independent axes:

1. **Mixture waveform parity** — the ``sp+mu_XdB.mp3`` files are plain
   waveform mixes (``lib/preprocessing.py:297-325``), so they are
   reproducible sample-for-sample: our ``mix_signals`` of the decoded
   ``sp``/``mu`` is cross-correlated against each shipped mixture (the
   residual is bounded by the double mp3 coding), plus an SMR
   discrimination matrix showing the matched SMR wins.
2. **Decomposition agreement (log-mel domain)** — shipped ``_Harmonic``/
   ``_Percussive`` renderings are *phase-decorrelated* from their inputs
   (measured: best sample-level |corr| ~0.1 at any lag, vs envelope corr
   ~0.88 at lag 0) and carry a flat HF noise floor in bands where the
   input is empty — i.e. they were rendered from magnitude/mel-domain
   features (Griffin-Lim-style), individually peak-normalized.  So the
   comparable domain is log-mel magnitude with gain and alignment fitted
   out.  We report corr/MAE of oracle (f64 numpy), fused-frontend
   ``bf16x3`` and ``highest`` against the shipped renderings, and the
   precision residual (frontend vs oracle) to show it is orders of
   magnitude below the rendering residual.
3. **Resynthesis forensics** — our ``cli.hpss_resynth`` output satisfies
   ``yh + yp == x`` exactly (soft masks sum to 1); the shipped files do
   not (per-file normalization).  We report our sum-consistency, the
   envelope correlation of our resynthesis against the shipped
   rendering, and the (expectedly near-zero) best-lag sample correlation
   that pins the provenance finding.

Writes ``HPSS_GOLDEN.json`` at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm_hpss_mtl_tpu.data import codecs
from sm_hpss_mtl_tpu.ops import reference as oracle
from sm_hpss_mtl_tpu.ops.mixing import mix_signals_np, normalize_signal_np

HPSS_DIR = "/root/reference/hpss_audio"
SR = 16000
N_FFT = 400
HOP = 160
L_HARM, L_PERC = 21, 11
SMRS = (-5, 0, 5, 10, 15, 20)


def _read(stem: str) -> np.ndarray:
    x, sr = codecs.read_mp3(os.path.join(HPSS_DIR, f"{stem}.mp3"))
    assert sr == SR, (stem, sr)
    return x.astype(np.float64)


def _corr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.ravel() - a.mean()
    b = b.ravel() - b.mean()
    den = np.linalg.norm(a) * np.linalg.norm(b)
    return float(np.dot(a, b) / den) if den else 0.0


def _sample_corr_bestlag(a, b, start, n, maxlag=2000):
    """Best |corr| of b (scanned over lags) against a[start:start+n]."""
    aa = a[start:start + n] - a[start:start + n].mean()
    best = (0.0, None)
    for lag in range(-maxlag, maxlag + 1):
        bb = b[start + lag:start + lag + n]
        bb = bb - bb.mean()
        den = np.linalg.norm(aa) * np.linalg.norm(bb)
        c = float(np.dot(aa, bb) / den) if den else 0.0
        if abs(c) > abs(best[0]):
            best = (c, lag)
    return best


def _envelope(a: np.ndarray, hop: int = HOP) -> np.ndarray:
    n = len(a) // hop * hop
    return np.sqrt((a[:n].reshape(-1, hop) ** 2).mean(axis=1))


def _logmel_db(S: np.ndarray, mel: np.ndarray) -> np.ndarray:
    """Features in dB: 20*log10(mel @ |S|) — the LogMel* feature scale
    (``power_to_db(fv**2)``) without the per-array top_db clamp, which
    would couple the metric to each rendering's noise floor."""
    return 20.0 * np.log10(mel @ S + 1e-10)


def _align(x_db: np.ndarray, shipped_audio: np.ndarray, start: int,
           n: int, mel: np.ndarray):
    """Find (sample offset, frame lag) of the shipped rendering that best
    matches our features; phase is gone, so alignment must be fitted."""
    best = (-2.0, 0, 0)
    for off in range(0, HOP, 4):
        S = oracle.stft_mag(shipped_audio[start + off:start + off + n],
                            n_fft=N_FFT, win_length=N_FFT, hop_length=HOP)
        s_db = _logmel_db(S, mel)
        for fl in range(-4, 5):
            t = min(x_db.shape[1], s_db.shape[1]) - abs(fl)
            a = x_db[:, max(fl, 0):max(fl, 0) + t]
            b = s_db[:, max(-fl, 0):max(-fl, 0) + t]
            c = _corr(a, b)
            if c > best[0]:
                best = (c, off, fl)
    return best[1], best[2]


def _aligned_pair(mine_db, shipped_db, fl):
    t = min(mine_db.shape[1], shipped_db.shape[1]) - abs(fl)
    a = mine_db[:, max(fl, 0):max(fl, 0) + t]
    b = shipped_db[:, max(-fl, 0):max(-fl, 0) + t]
    return a, b


def _mae_gain_removed(a, b, active_only=False) -> float:
    """MAE in dB after removing the per-pair median offset (the shipped
    files are individually peak-normalized — gain is not comparable).
    ``active_only`` restricts to bins above the shipped rendering's
    median level, excluding its flat noise floor in empty bands."""
    d = a - b
    if active_only:
        d = d[b > np.median(b)]
    return float(np.abs(d - np.median(d)).mean())


def mixture_parity(window_s: int) -> dict:
    sp = normalize_signal_np(_read("sp"))
    mu = normalize_signal_np(_read("mu"))
    start, n = SR * 60, SR * min(window_s, 10)
    ours = {db: mix_signals_np(sp, mu, float(db)) for db in SMRS}
    out = {"lag_scan": "+-400 samples", "window_s": n // SR,
           "corr_matched": {}, "matched_lag": {}, "smr_discrimination": {}}
    for db in SMRS:
        shipped = _read(f"sp+mu_{db}dB")
        c, lag = _sample_corr_bestlag(shipped, ours[db], start, n, maxlag=400)
        out["corr_matched"][str(db)] = round(c, 4)
        out["matched_lag"][str(db)] = lag
    # discrimination row: shipped 0 dB against our mixes at every SMR
    shipped0 = _read("sp+mu_0dB")
    row = {}
    for db in SMRS:
        seg_a = shipped0[start:start + n]
        seg_b = ours[db][start:start + n]
        row[str(db)] = round(_corr(seg_a, seg_b), 4)
    out["smr_discrimination"]["shipped_0dB_vs_ours"] = row
    return out


def decomposition_agreement(stems, window_s: int, precisions) -> dict:
    import jax
    import jax.numpy as jnp
    from sm_hpss_mtl_tpu.ops.frontend_pallas import stft_hpss_mel

    mel = np.asarray(oracle.mel_filterbank(sr=22050, n_fft=N_FFT,
                                           n_mels=120), np.float64)
    # the pipeline's mel basis keeps the reference's sr=22050 default
    # quirk (melspectrogram(S=...) at lib/preprocessing.py:408)
    n = SR * window_s

    fused = {}
    for prec in precisions:
        fused[prec] = jax.jit(lambda y, p=prec: stft_hpss_mel(
            y, jnp.asarray(mel, jnp.float32), n_fft=N_FFT,
            win_length=N_FFT, hop_length=HOP, l_harm=L_HARM,
            l_perc=L_PERC, dft_precision=p))

    results = {}
    for stem in stems:
        x = normalize_signal_np(_read(stem))
        start = min(SR * 60, max(0, len(x) - n) // 2)
        seg = x[start:start + n]
        S = oracle.stft_mag(seg, n_fft=N_FFT, win_length=N_FFT,
                            hop_length=HOP)
        H, P = oracle.hpss(S, l_harm=L_HARM, l_perc=L_PERC)
        ora = {"H": _logmel_db(H, mel), "P": _logmel_db(P, mel)}

        mine = {"oracle": ora}
        for prec in precisions:
            mh, mp = fused[prec](jnp.asarray(seg, jnp.float32))
            mine[prec] = {"H": 20.0 * np.log10(np.asarray(mh, np.float64) + 1e-10),
                          "P": 20.0 * np.log10(np.asarray(mp, np.float64) + 1e-10)}

        entry = {"window_s": window_s, "start_s": start // SR,
                 "align": {}, "logmel_db_corr": {}, "logmel_db_mae": {},
                 "precision_residual_db_mae": {}}
        for comp, suffix in (("H", "_Harmonic"), ("P", "_Percussive")):
            shipped_audio = _read(stem + suffix)
            off, fl = _align(ora[comp], shipped_audio, start, n, mel)
            entry["align"][comp] = {"sample_offset": off, "frame_lag": fl}
            S_ship = oracle.stft_mag(
                shipped_audio[start + off:start + off + n],
                n_fft=N_FFT, win_length=N_FFT, hop_length=HOP)
            ship_db = _logmel_db(S_ship, mel)
            for name in mine:
                a, b = _aligned_pair(mine[name][comp], ship_db, fl)
                entry["logmel_db_corr"][f"{name}_{comp}"] = round(_corr(a, b), 4)
                entry["logmel_db_mae"][f"{name}_{comp}"] = round(
                    _mae_gain_removed(a, b), 3)
                entry.setdefault("logmel_db_mae_active", {})[
                    f"{name}_{comp}"] = round(
                        _mae_gain_removed(a, b, active_only=True), 3)
            for prec in precisions:
                t = min(mine[prec][comp].shape[1], ora[comp].shape[1])
                entry["precision_residual_db_mae"][f"{prec}_{comp}"] = round(
                    float(np.abs(mine[prec][comp][:, :t]
                                 - ora[comp][:, :t]).mean()), 5)
        results[stem] = entry
    return results


def resynthesis_forensics(stems, window_s: int) -> dict:
    from sm_hpss_mtl_tpu.cli.hpss_resynth import resynthesize

    n = SR * window_s
    out = {}
    for stem in stems:
        x = normalize_signal_np(_read(stem))
        start = min(SR * 60, max(0, len(x) - n) // 2)
        seg = x[start:start + n].astype(np.float32)
        yh, yp = resynthesize(seg, n_fft=N_FFT, win_length=N_FFT,
                              hop_length=HOP, l_harm=L_HARM, l_perc=L_PERC)
        # interior only: center=False iSTFT cannot reconstruct the first/
        # last partial windows, which is framing, not mask error
        intr = slice(N_FFT, (n - N_FFT) // HOP * HOP)
        sum_err = float(np.linalg.norm((yh + yp - seg)[intr])
                        / max(np.linalg.norm(seg[intr]), 1e-12))
        entry = {"window_s": window_s,
                 "sum_consistency_rel_err": round(sum_err, 6)}
        for comp, y in (("Harmonic", yh), ("Percussive", yp)):
            shipped = _read(f"{stem}_{comp}")
            ship_seg = shipped[start:start + n]
            entry[f"envelope_corr_{comp[0]}"] = round(
                _corr(_envelope(np.asarray(y, np.float64)),
                      _envelope(ship_seg)), 4)
            # ceiling: the raw input's envelope against the same shipped
            # rendering over the same window (phase-free upper context)
            entry[f"envelope_corr_input_vs_shipped_{comp[0]}"] = round(
                _corr(_envelope(seg.astype(np.float64)),
                      _envelope(ship_seg)), 4)
            c, lag = _sample_corr_bestlag(
                shipped, np.concatenate([np.zeros(start), np.asarray(y, np.float64)]),
                start + SR, SR * 2, maxlag=1500)
            entry[f"sample_corr_{comp[0]}_bestlag"] = [round(c, 4), lag]
        out[stem] = entry
    return out


PROVENANCE = [
    "Shipped _Harmonic/_Percussive mp3s are phase-decorrelated from their "
    "inputs: best |sample corr| ~0.1 at any lag within +-4000, while frame "
    "RMS envelopes correlate ~0.83-0.88 at lag 0 -> rendered from "
    "magnitude/mel-domain features (Griffin-Lim-style), not masked-iSTFT "
    "with the original phase.",
    "Shipped decompositions carry a flat ~-36 dBFS noise floor in bands "
    "where the input is empty, and are individually peak-normalized "
    "(|H|+|P| ~10x |X|) — absolute gain and fine spectral structure are "
    "not comparable; log-mel with gain/alignment fitted out is.",
    "The sp+mu_XdB mixtures ARE waveform-reproducible (no phase "
    "destruction): our mix_signals of the decoded sp/mu correlates ~0.9 "
    "at lag 0 with every shipped mixture; the residual is the double mp3 "
    "coding.",
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "HPSS_GOLDEN.json"))
    ap.add_argument("--window", type=int, default=60,
                    help="analysis window seconds per file")
    ap.add_argument("--stems", nargs="*", default=None,
                    help="decomposition stems (default: all 8)")
    ap.add_argument("--precisions", nargs="*",
                    default=["bf16x3", "highest"])
    args = ap.parse_args(argv)

    stems = args.stems or (["sp", "mu"]
                           + [f"sp+mu_{db}dB" for db in SMRS])
    report = {
        "reference_assets": HPSS_DIR,
        "generating_code": "lib/preprocessing.py:404-422 (script absent "
                           "from the reference; SURVEY.md §2.3)",
        "provenance_findings": PROVENANCE,
        "mixture_waveform_parity": mixture_parity(args.window),
        "decompositions": decomposition_agreement(
            stems, args.window, args.precisions),
        "resynthesis": resynthesis_forensics(["sp", "mu"], args.window),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
