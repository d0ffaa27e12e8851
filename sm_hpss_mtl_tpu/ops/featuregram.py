"""End-to-end featuregram computation: audio -> (D, T) feature matrix.

Replaces the featName dispatch of the reference's
``lib/preprocessing.py:get_featuregram`` (:355-457) with one jitted,
batched pipeline per feature name.  The whole chain — framing, rFFT, HPSS
medians + masks, mel matmul, log scaling — compiles to a single XLA
program, so a batch of files is one HBM round trip instead of the
reference's per-file librosa calls.

Feature names match the reference exactly
(``/root/reference/Proposed_Work_Results.py:750-757``):

===================  =====================================================
featName             output (rows x frames)
===================  =====================================================
Spec                 |STFT|                                  (F, T)
LogSpec              power_to_db(|STFT|^2)                   (F, T)
MelSpec              mel-power spectrogram (sr=fs)           (n_mels, T)
LogMelSpec           power_to_db(MelSpec^2)                  (n_mels, T)
HarmSpec/PercSpec    HPSS component magnitude                (F, T)
HarmPercSpec         [H; P] stacked on the freq axis         (2F, T)
Log{Harm,Perc,HP}    power_to_db(component^2)                (F or 2F, T)
Mel{Harm,Perc,HP}    mel(S=component)  [sr=22050 quirk]      (n_mels.., T)
LogMel{Harm,Perc,…}  power_to_db(mel(component)^2)           (n_mels.., T)
===================  =====================================================

The "sr=22050 quirk": the reference builds the mel bank for HPSS branches
with librosa's default sampling rate instead of 16 kHz (see
``ops.reference.melspectrogram_from_S``).  Replicated here for parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import hpss as hpss_mod
from . import mel as mel_mod
from . import stft as stft_mod

#: Feature names supported, mirroring the reference's featName values.
FEATURE_NAMES = (
    "Spec", "LogSpec", "MelSpec", "LogMelSpec",
    "HarmSpec", "PercSpec", "HarmPercSpec",
    "LogHarmSpec", "LogPercSpec", "LogHarmPercSpec",
    "MelHarmSpec", "MelPercSpec", "MelHarmPercSpec",
    "LogMelHarmSpec", "LogMelPercSpec", "LogMelHarmPercSpec",
)

#: librosa's default sr, used by the reference for mel banks over HPSS output.
_MEL_SR_QUIRK = 22050


def _parse(feat_name: str):
    """Split a featName into (log, mel, harm, perc) flags."""
    if feat_name not in FEATURE_NAMES:
        raise ValueError(f"unknown featName {feat_name!r}")
    name = feat_name
    log = name.startswith("Log")
    if log:
        name = name[len("Log"):]
    mel = name.startswith("Mel")
    if mel:
        name = name[len("Mel"):]
    harm = name.startswith("HarmPerc") or name.startswith("Harm")
    perc = "Perc" in name
    return log, mel, harm, perc


@functools.partial(
    jax.jit,
    static_argnames=("feat_name", "sr", "n_fft", "win_length", "hop_length",
                     "n_mels", "l_harm", "l_perc", "use_pallas",
                     "dft_precision", "top_db"))
def featuregram(y: jax.Array, *, feat_name: str, sr: int = 16000,
                n_fft: int = 400, win_length: int = 400, hop_length: int = 160,
                n_mels: int = 120, l_harm: int = 21, l_perc: int = 11,
                use_pallas: bool = False, valid_frames=None,
                dft_precision: str = "bf16x3",
                top_db: float | None = 80.0) -> jax.Array:
    """Compute the featuregram for audio ``(..., n_samples)`` ->
    ``(..., D, T)``.

    ``use_pallas`` switches the HPSS median+mask stage to the fused Pallas
    TPU kernel (``ops.hpss_pallas``); the default jnp path is used for CPU
    tests and as the correctness oracle.  ``valid_frames`` (traced scalar)
    limits the data-dependent power_to_db clamp to real frames when the
    audio was length-padded (see ``data.featurize.Featurizer``).
    ``dft_precision`` ('bf16x3' | 'highest') selects the fused frontend's
    windowed-DFT matmul precision (see HPSS_GOLDEN.json / NOTES.md for
    the measured policy evidence).  ``top_db`` is librosa's dB clamp
    width; ``None`` skips the clamp (the log map is then purely
    elementwise — used by ``featuregram_slabbed`` to defer the
    global-peak clamp until all slabs exist).
    """
    log, mel, harm, perc = _parse(feat_name)

    if not (harm or perc):
        if mel:
            # MelSpec / LogMelSpec: mel-power spectrogram at the true sr.
            S = stft_mod.stft_mag(y, n_fft=n_fft, win_length=win_length,
                                  hop_length=hop_length) ** 2
            fv = mel_mod.apply_mel(S, sr=sr, n_mels=n_mels)
        else:
            fv = stft_mod.stft_mag(y, n_fft=n_fft, win_length=win_length,
                                   hop_length=hop_length)
        if log:
            fv = mel_mod.power_to_db(fv ** 2, valid_len=valid_frames,
                                     top_db=top_db)
        return fv.astype(jnp.float32)

    # HPSS branches.
    if use_pallas and mel:
        # Fully fused frontend: windowed DFT + medians + masks + mel in
        # one Pallas pass — the full-resolution spectrogram never
        # touches HBM (ops.frontend_pallas).
        from . import frontend_pallas
        M = mel_mod.mel_filterbank(_MEL_SR_QUIRK, n_fft, n_mels)
        H, P = frontend_pallas.stft_hpss_mel(
            y, M, n_fft=n_fft, win_length=win_length,
            hop_length=hop_length, l_harm=l_harm, l_perc=l_perc,
            dft_precision=dft_precision)
        already_mel = True
    elif use_pallas:
        # Full-resolution fused frontend (HarmSpec/PercSpec families —
        # the Papakostas-MTL and Jang-MTL presets).
        from . import frontend_pallas
        H, P = frontend_pallas.stft_hpss(
            y, n_fft=n_fft, win_length=win_length, hop_length=hop_length,
            l_harm=l_harm, l_perc=l_perc, dft_precision=dft_precision)
        already_mel = False
    else:
        S = stft_mod.stft_mag(y, n_fft=n_fft, win_length=win_length,
                              hop_length=hop_length)
        H, P = hpss_mod.hpss(S, l_harm=l_harm, l_perc=l_perc)
        already_mel = False

    def _post(component):
        fv = component
        if mel and not already_mel:
            fv = mel_mod.apply_mel(fv, sr=_MEL_SR_QUIRK, n_mels=n_mels)
        if log:
            # power_to_db(fv**2): the reference squares the (already
            # magnitude-domain) feature before the dB map.
            fv = mel_mod.power_to_db(fv ** 2, valid_len=valid_frames,
                                     top_db=top_db)
        return fv.astype(jnp.float32)

    parts = []
    if harm:
        parts.append(_post(H))
    if perc:
        parts.append(_post(P))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-2)


def featuregram_slabbed(y, *, feat_name: str, slab_frames: int = 16384,
                        sr: int = 16000, n_fft: int = 400,
                        win_length: int = 400, hop_length: int = 160,
                        n_mels: int = 120, l_harm: int = 21,
                        l_perc: int = 11, use_pallas: bool = False,
                        dft_precision: str = "bf16x3",
                        top_db: float | None = 80.0,
                        device_out: bool = False):
    """Serving-path featuregram for one long recording: fixed-shape slab
    programs instead of one broadcast-length program.

    ``featuregram`` jit-compiles per audio length — fine for training
    (the featurizer cache is length-bucketed) but wrong for serving,
    where every new broadcast duration pays a fresh XLA compile
    (measured: 27 s at 0.5 h of audio on v5e).  This helper runs the
    recording as ``slab_frames``-frame windows with ``l_harm//2``-frame
    real-audio margins at interior seams, so at most TWO compiled
    programs exist per configuration (edge / interior window shapes),
    reused across all broadcasts of every length.

    Exactness vs the whole-signal ``featuregram``: the harmonic median
    needs ``l_harm//2`` frames of time context; each window computes
    that margin from real audio and the margin frames are trimmed, so
    interior frames match exactly.  The first/last windows keep the
    true global edge, so the kernel's spectral edge mirror fires
    exactly where the whole-signal program's does.  librosa's
    ``top_db`` clamp references the max of each ``power_to_db`` call's
    input — i.e. the max PER COMPONENT for two-part [H; P] features and
    the whole-spectrogram max otherwise (``ops.mel.power_to_db``).
    Slabs are computed unclamped (``top_db=None`` — the log map is then
    elementwise, hence slab-exact) and the clamp is applied once at the
    end: per D/2-row component block for HarmPerc features, globally
    for single-component ones.

    Returns a host ``numpy`` array ``(D, T)`` by default — serving
    output is consumed host-side (``StreamingSegmenter`` re-slabs it).
    With ``device_out=True`` the slabs are assembled on DEVICE and a
    ``jax.Array`` is returned: the TPU-native serving chain
    (featurize -> scan segmenter) then never ships the featuregram over
    the host link — only raw audio goes up and probability tracks come
    down (``tools/bench_serving.py`` ``serve_dev`` leg).

    Reference serving path (featurizes whole multi-hour broadcasts in
    one librosa call): DAFx12_Speech_Music_Detection_B3_MTL_v2.py:634-676.
    """
    if y.ndim != 1:
        raise ValueError("featuregram_slabbed takes one recording (1-D)")
    log, _, harm, perc = _parse(feat_name)
    hop, S = hop_length, int(slab_frames)
    T = 1 + (int(y.shape[0]) - n_fft) // hop
    margin = (l_harm // 2) if (harm or perc) else 0
    if S <= margin:
        raise ValueError(f"slab_frames {S} must exceed the harmonic "
                         f"median margin {margin}")
    kw = dict(feat_name=feat_name, sr=sr, n_fft=n_fft,
              win_length=win_length, hop_length=hop_length,
              n_mels=n_mels, l_harm=l_harm, l_perc=l_perc,
              use_pallas=use_pallas, dft_precision=dft_precision)
    xp = jnp if device_out else np
    if T <= S + margin:
        whole = featuregram(jnp.asarray(y)[None], top_db=top_db, **kw)[0]
        return whole if device_out else np.asarray(whole)

    y = np.asarray(y)

    def window(f0, f1):
        seg = jnp.asarray(y[f0 * hop:(f1 - 1) * hop + n_fft])
        out = featuregram(seg[None], top_db=None, **kw)[0]
        return out if device_out else np.asarray(out)

    parts = [window(0, S + margin)[:, :S]]              # true left edge
    n_cores = -(-T // S)
    for k in range(1, n_cores - 1):
        w = window(k * S - margin, (k + 1) * S + margin)
        parts.append(w[:, margin:margin + S])
    tail = T - (n_cores - 1) * S                        # in (0, S]
    w = window(T - S - margin, T)                       # true right edge
    parts.append(w[:, S + margin - tail:])
    fv = xp.concatenate(parts, axis=-1)
    if log and top_db is not None:
        if harm and perc:
            # Two-component features ([H; P] stacked on the row axis):
            # the whole-signal path runs power_to_db PER component
            # (one call per part in featuregram._post, matching the
            # reference's per-call clamp at
            # /root/reference/lib/preprocessing.py:420-422 and
            # 5_class_classification.py:363-365), so each D/2-row block
            # is clamped by its OWN global max here.
            half = fv.shape[0] // 2
            fv = xp.concatenate(
                [xp.maximum(blk, blk.max() - np.float32(top_db))
                 for blk in (fv[:half], fv[half:])], axis=0)
        else:
            fv = xp.maximum(fv, fv.max() - np.float32(top_db))
    return fv


def feature_dim(feat_name: str, *, n_fft: int = 400, n_mels: int = 120) -> int:
    """Number of feature rows D for a featName (static shape helper)."""
    log, mel, harm, perc = _parse(feat_name)
    base = n_mels if mel else 1 + n_fft // 2
    return base * (2 if (harm and perc) else 1)
