"""TPU-side Pallas parity runner.

Runs the fused HPSS / HPSS+mel Pallas kernels on the REAL chip at
production shapes (F=201/257, T odd / at / across tile boundaries,
n_mels=120) against the jnp oracle (``ops/hpss.py``, f32 HIGHEST) and
the host numpy reference, and writes ``PARITY_TPU_r{N}.json``.

This pins the claim CPU interpret-mode tests can't: the Mosaic-compiled
kernel on v5e is (expected) bit-exact to the oracle at the shapes the
framework actually runs (BASELINE.json mask-fidelity bar <1e-3).

    python tools/parity_tpu.py --out PARITY_TPU_r2.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b), 1e-12)
    return float(np.max(np.abs(a - b) / denom))


def max_abs(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="PARITY_TPU_r2.json")
    p.add_argument("--tile-t", type=int, default=364)
    args = p.parse_args(argv)

    from sm_hpss_mtl_tpu.ops import hpss as oracle
    from sm_hpss_mtl_tpu.ops import hpss_pallas as kern
    from sm_hpss_mtl_tpu.ops.reference import mel_filterbank

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    tile = args.tile_t

    # Production geometries: n_fft=400 -> F=201, n_fft=512 -> F=257 (Jang);
    # T: shorter than a tile, exactly one tile, odd & across tiles, and a
    # many-tile 30 s clip (T=2998 @ hop 160).
    cases = []
    for F in (201, 257):
        for T in (97, 363, tile, tile + 1, 2 * tile, 1093, 2998):
            cases.append((F, T))

    results = {"backend": backend, "tile_t": tile, "l_harm": 21,
               "l_perc": 11, "cases": [], "mel_cases": []}
    ok = True

    for F, T in cases:
        S = jnp.asarray(np.abs(rng.standard_normal((2, F, T)))
                        .astype(np.float32)) ** 2
        Hk, Pk = kern.hpss(S, l_harm=21, l_perc=11, tile_t=tile)
        Ho, Po = oracle.hpss(S, l_harm=21, l_perc=11)
        jax.block_until_ready((Hk, Pk, Ho, Po))
        row = {"F": F, "T": T,
               "max_abs_H": max_abs(Hk, Ho), "max_abs_P": max_abs(Pk, Po),
               "rel_H": rel_err(Hk, Ho), "rel_P": rel_err(Pk, Po),
               "bitexact": bool(np.array_equal(np.asarray(Hk), np.asarray(Ho))
                                and np.array_equal(np.asarray(Pk),
                                                   np.asarray(Po)))}
        results["cases"].append(row)
        ok &= row["rel_H"] < 1e-3 and row["rel_P"] < 1e-3
        print(f"hpss F={F} T={T}: rel_H={row['rel_H']:.3e} "
              f"rel_P={row['rel_P']:.3e} bitexact={row['bitexact']}")

    # Fused HPSS+mel at the flagship config (n_mels=120) and the Jang one.
    for F, n_fft, n_mels, T in ((201, 400, 120, 1093), (257, 512, 120, 2998)):
        S = jnp.asarray(np.abs(rng.standard_normal((2, F, T)))
                        .astype(np.float32)) ** 2
        M = jnp.asarray(mel_filterbank(16000, n_fft, n_mels))
        mh, mp = kern.hpss_mel(S, M, l_harm=21, l_perc=11, tile_t=tile)
        Ho, Po = oracle.hpss(S, l_harm=21, l_perc=11)
        ein = lambda X: jnp.einsum("mf,bft->bmt", M, X,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        mo_h, mo_p = ein(Ho), ein(Po)
        jax.block_until_ready((mh, mp, mo_h, mo_p))
        # The mel matmul reassociates; compare against the oracle product
        # with an fp32-matmul tolerance, plus the BASELINE relative bar.
        row = {"F": F, "n_mels": n_mels, "T": T,
               "max_abs_melH": max_abs(mh, mo_h),
               "max_abs_melP": max_abs(mp, mo_p),
               "rel_melH": rel_err(mh, mo_h), "rel_melP": rel_err(mp, mo_p)}
        results["mel_cases"].append(row)
        ok &= row["rel_melH"] < 1e-3 and row["rel_melP"] < 1e-3
        print(f"hpss_mel F={F} T={T}: rel_melH={row['rel_melH']:.3e} "
              f"rel_melP={row['rel_melP']:.3e}")

    # Fully fused audio->mel-HPSS frontend (ops.frontend_pallas) vs the
    # oracle chain, at production audio lengths and both DFT precisions.
    # Gates: 'highest' must hold the strict <1e-3 relative bar; the
    # default bf16x3 is gated in the dB domain the models actually
    # consume (<0.05 dB on power_to_db-scale features; measured ~0.01).
    from sm_hpss_mtl_tpu.ops import frontend_pallas as fp
    from sm_hpss_mtl_tpu.ops import mel as mel_mod
    from sm_hpss_mtl_tpu.ops import stft as stft_mod

    results["frontend_cases"] = []
    for n_fft, n_sec in ((400, 30.0), (400, 1.0), (512, 30.0)):
        n = int(n_sec * 16000)
        y = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
        M = mel_mod.mel_filterbank(22050, n_fft, 120)
        S = stft_mod.stft_mag(y, n_fft=n_fft, win_length=400,
                              hop_length=160)
        Ho, Po = oracle.hpss(S, l_harm=21, l_perc=11)
        ein = lambda X: jnp.einsum("mf,bft->bmt", jnp.asarray(M), X,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        go_h, go_p = np.asarray(ein(Ho)), np.asarray(ein(Po))

        def db(x):
            return 10.0 * np.log10(np.maximum(1e-10, np.asarray(x) ** 2))

        for prec in ("bf16x3", "highest"):
            mh, mp = fp.stft_hpss_mel(y, M, n_fft=n_fft, win_length=400,
                                      hop_length=160, l_harm=21, l_perc=11,
                                      dft_precision=prec)
            jax.block_until_ready((mh, mp))
            row = {"n_fft": n_fft, "seconds": n_sec, "dft_precision": prec,
                   "max_abs_H": max_abs(mh, go_h),
                   "max_abs_P": max_abs(mp, go_p),
                   "rel_H": rel_err(mh, go_h), "rel_P": rel_err(mp, go_p),
                   "db_err_H": float(np.max(np.abs(db(mh) - db(go_h)))),
                   "db_err_P": float(np.max(np.abs(db(mp) - db(go_p))))}
            results["frontend_cases"].append(row)
            if prec == "highest":
                ok &= row["rel_H"] < 1e-3 and row["rel_P"] < 1e-3
            else:
                ok &= row["db_err_H"] < 0.05 and row["db_err_P"] < 0.05
            print(f"frontend n_fft={n_fft} sec={n_sec} {prec}: "
                  f"rel_H={row['rel_H']:.3e} db_err_H={row['db_err_H']:.4f}")

    # Slabbed serving featurization vs the whole-signal program, ON THE
    # CHIP with the fused Pallas frontend (VERDICT r4 next #7): the CPU
    # parity tests never exercise the kernel's edge-flag handling at
    # slab seams on real hardware.  170 s of audio with a loud burst at
    # the end so the deferred per-component top_db clamp binds.
    from sm_hpss_mtl_tpu.ops.featuregram import featuregram, featuregram_slabbed

    results["slabbed_cases"] = []
    use_pallas = backend == "tpu"
    for n_sec, slab in ((170.0, 4096), (40.0, 1024)):
        n = int(n_sec * 16000)
        y = (1e-5 * rng.standard_normal(n)).astype(np.float32)
        y[-8000:] += np.sin(2 * np.pi * 440 * np.arange(8000) / 16000
                            ).astype(np.float32)
        whole = np.asarray(featuregram(
            jnp.asarray(y)[None], feat_name="LogMelHarmPercSpec",
            n_mels=120, use_pallas=use_pallas)[0])
        got = featuregram_slabbed(
            y, feat_name="LogMelHarmPercSpec", n_mels=120,
            slab_frames=slab, use_pallas=use_pallas)
        row = {"seconds": n_sec, "slab_frames": slab,
               "use_pallas": use_pallas,
               "max_abs_db": max_abs(got, whole),
               "clamp_bound": bool((whole == whole[:120].max() - 80.0).any()
                                   or (whole == whole[120:].max() - 80.0
                                       ).any())}
        results["slabbed_cases"].append(row)
        # Bar: 0.05 dB — the same dB-domain gate as the bf16x3 frontend
        # (slab windows re-run the same kernel; only inter-program
        # rounding and clamp-floor ulps differ).
        ok &= row["max_abs_db"] < 0.05
        print(f"slabbed sec={n_sec} slab={slab}: "
              f"max_abs_db={row['max_abs_db']:.4f} "
              f"clamp_bound={row['clamp_bound']}")

    results["pass"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(("PASS" if ok else "FAIL"), "->", args.out)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
