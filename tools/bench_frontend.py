"""Fused-frontend grid-scaling curve + roofline (VERDICT r3 next #2/#3).

Round-3 probes found per-cell kernel time growing ~28 -> 46 us as the
grid grows past the bench geometry (B16x30s = 64 cells -> B16x120s =
256), so audio-h/s is not batch-invariant and the bench headline sat at
its favorable geometry.  This tool makes the curve and its cause a
committed measurement:

  * **curve** legs: the public ``stft_hpss_mel`` path per geometry x
    tile-cap (768 / 504 / 376), per-cell microseconds.
  * **decomp** legs: the same geometry split into XLA-side tile prep
    (``_audio_tiles``), the Pallas kernel with raw (un-untiled) output,
    and the full path — locating where the growth lives (kernel vs the
    surrounding reshape/transpose traffic).
  * **phase** legs: kernel with ``stage='no_median'`` (median selection
    networks and mask math skipped) vs full — the VPU median share of
    the kernel, answering the roofline's "what serializes" question.
  * **roofline** rows: analytic MXU-pass FLOPs (bf16x3 = 3 passes/DFT
    block-matmul, HIGHEST mel = 6), VPU element-ops from the kernel's
    comparator count, and true kernel HBM bytes, against the v5e peaks
    (197 bf16 TFLOP/s MXU, 819 GB/s HBM, VPU ~= 6 Top/s approximate:
    4 x (8,128) lanes at the ~1.5 GHz implied by the MXU spec, non-FMA
    min/max ops) — reporting which bound the measured time sits on.

Methodology: every leg in its own single-program subprocess (shared
persistent compile cache) — resident-program contamination measures
sub-ms programs up to 10x slower otherwise (NOTES.md r3); rounds
interleaved across the full leg list; min and median per leg reported.

    python tools/bench_frontend.py --out FRONTEND_bench.json
"""

import argparse
import itertools
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

GEOMETRIES = {"16x30": (16, 30.0), "32x30": (32, 30.0),
              "16x120": (16, 120.0)}
CAPS = (768, 504, 376)
N_FFT, WIN, HOP, L_HARM, L_PERC, N_MELS, F = 400, 400, 160, 21, 11, 120, 201


def audio_for(geom):
    B, seconds = GEOMETRIES[geom]
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.standard_normal((B, int(seconds * 16000))).astype(np.float32))


def grid_cells(geom, cap):
    from sm_hpss_mtl_tpu.ops.frontend_pallas import _pick_tile
    B, seconds = GEOMETRIES[geom]
    T = 1 + (int(seconds * 16000) - N_FFT) // HOP
    tile = _pick_tile(T, cap)
    return B * (-(-T // tile)), tile, T


def mel_T():
    from sm_hpss_mtl_tpu.ops.mel import mel_filterbank
    return jnp.asarray(mel_filterbank(16000, N_FFT, N_MELS),
                       jnp.float32).T  # (F, n_mels)


def leg_step(leg: str, geom: str, cap: int):
    """(step_fn, carry) for one timed leg."""
    from sm_hpss_mtl_tpu.ops import frontend_pallas as fp

    y = audio_for(geom)
    _, tile, T = grid_cells(geom, cap)
    # Off-TPU (CPU smoke tests) the Pallas legs need interpret mode;
    # on the chip this is False and has no effect.
    interp = jax.default_backend() != "tpu"
    kw = dict(n_fft=N_FFT, win_length=WIN, hop_length=HOP, l_harm=L_HARM,
              l_perc=L_PERC, power=2.0)

    if leg == "full":
        from sm_hpss_mtl_tpu.ops.mel import mel_filterbank
        M = jnp.asarray(mel_filterbank(16000, N_FFT, N_MELS), jnp.float32)

        def step(a):
            H, P = fp.stft_hpss_mel(a, M, tile_t=cap, interpret=interp,
                                    **kw)
            delta = jnp.mean(H + P, axis=(-2, -1))[..., None]
            return a + 1e-6 * delta
        return step, y

    if leg == "prep":
        ht = L_HARM // 2

        @jax.jit
        def step(a):
            sb, halos, _, _ = fp._audio_superblocks(
                a, T=T, tile_t=tile, hop=HOP, J=-(-N_FFT // HOP), ht=ht)
            # Consume the superblocks AND the halo stack so neither can
            # be dead-code eliminated; the extra full-array reduce costs
            # ~bytes/819GBps, identical across geometries per cell.
            return a * (1.0 + 1e-12 * (jnp.sum(sb) + jnp.sum(halos)))
        return step, y

    if leg in ("raw", "no_median"):
        MT = mel_T()
        stage = "no_median" if leg == "no_median" else "full"

        def step(a):
            H, P = fp._frontend_pallas(a, MT, tile_t=tile, raw_out=True,
                                       stage=stage, interpret=interp,
                                       **kw)
            delta = jnp.mean(H + P, axis=(-3, -2, -1))[..., None]
            return a + 1e-6 * delta
        return step, y

    raise ValueError(leg)


def run_child(leg: str, geom: str, cap: int):
    from sm_hpss_mtl_tpu.utils.benchmarking import time_op
    step, carry = leg_step(leg, geom, cap)
    t_min = time_op(step, carry, iters=(3, 13), repeats=4)
    t_med = time_op(step, carry, iters=(3, 13), repeats=4, stat="median")
    cells, tile, T = grid_cells(geom, cap)
    row = {"leg": leg, "geom": geom, "cap": cap, "tile": tile,
           "cells": cells,
           "ms": round(t_min * 1e3, 4), "ms_median": round(t_med * 1e3, 4),
           "us_per_cell": round(t_min * 1e6 / cells, 2),
           "us_per_cell_median": round(t_med * 1e6 / cells, 2)}
    print(json.dumps(row))
    return row


# ---------------------------------------------------------------------------
# Analytic roofline
# ---------------------------------------------------------------------------

V5E_MXU_BF16 = 197e12
V5E_HBM = 819e9
V5E_VPU_APPROX = 6e12  # 4 x (8,128) lanes x ~1.5 GHz, non-FMA ops

def roofline_row(geom: str, cap: int, measured_raw_ms: float,
                 measured_nomed_ms: float, prep_ms: float = 0.0):
    from sm_hpss_mtl_tpu.ops.hpss_pallas import median_network
    cells, tile, T = grid_cells(geom, cap)
    ht, hp = L_HARM // 2, L_PERC // 2
    n_fr = tile + 2 * ht
    Fpad = F + 2 * hp
    J = -(-N_FFT // HOP)
    # MXU work in bf16-pass FLOPs: bf16x3 runs 3 one-pass matmuls per
    # DFT block; the HIGHEST-precision mel projections cost 6 passes.
    dft = 3 * J * 2 * n_fr * HOP * 2 * Fpad
    mel = 6 * 2 * 2 * tile * F * N_MELS
    comparators = len(median_network(L_HARM)) + len(median_network(L_PERC))
    vpu = (comparators * 2 + 12) * tile * F
    hbm = (n_fr * HOP + 2 * tile * N_MELS) * 4  # audio tile in, mel out
    t_mxu = (dft + mel) / V5E_MXU_BF16
    t_vpu = vpu / V5E_VPU_APPROX
    t_hbm = hbm / V5E_HBM
    # Kernel-only time: the raw leg still runs the XLA-side tile prep
    # before pallas_call, so subtract the separately-measured prep leg.
    kernel_ms = max(measured_raw_ms - prep_ms, 1e-6)
    t_cell = kernel_ms * 1e-3 / cells
    med_share = (measured_raw_ms - measured_nomed_ms) / kernel_ms
    return {
        "geom": geom, "cells": cells, "tile": tile,
        "mxu_bf16_pass_gflops_per_cell": round((dft + mel) / 1e9, 3),
        "vpu_element_gops_per_cell": round(vpu / 1e9, 3),
        "kernel_hbm_mb_per_cell": round(hbm / 1e6, 3),
        "bound_us_mxu": round(t_mxu * 1e6, 2),
        "bound_us_vpu_approx": round(t_vpu * 1e6, 2),
        "bound_us_hbm": round(t_hbm * 1e6, 2),
        "measured_us_per_cell": round(t_cell * 1e6, 2),
        "mxu_frac_of_peak": round(t_mxu / t_cell, 3),
        "vpu_frac_of_peak_approx": round(t_vpu / t_cell, 3),
        "serial_mxu_plus_vpu_frac": round((t_mxu + t_vpu) / t_cell, 3),
        "median_share_measured": round(med_share, 3),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "FRONTEND_bench.json"))
    p.add_argument("--jax-cache", default="/tmp/frontend_jaxcache")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--child", default=None,
                   help="internal: 'leg:geom:cap' — measure one leg")
    args = p.parse_args(argv)

    if args.jax_cache:
        jax.config.update("jax_compilation_cache_dir", args.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.child:
        leg, geom, cap = args.child.split(":")
        run_child(leg, geom, int(cap))
        return

    legs = []
    for geom, cap in itertools.product(GEOMETRIES, CAPS):
        legs.append(("full", geom, cap))
    for geom in GEOMETRIES:
        legs.append(("prep", geom, 768))
        legs.append(("raw", geom, 768))
        legs.append(("no_median", geom, 768))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    samples = {}
    for r in range(args.rounds):
        for leg, geom, cap in legs:
            child = f"{leg}:{geom}:{cap}"
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", child, "--jax-cache", args.jax_cache]
            proc = subprocess.run(cmd, cwd=REPO, env=env,
                                  capture_output=True, text=True,
                                  timeout=1800)
            if proc.returncode != 0:
                raise RuntimeError(f"child {child} failed\n"
                                   f"{proc.stdout[-2000:]}\n"
                                   f"{proc.stderr[-2000:]}")
            row = json.loads(proc.stdout.strip().splitlines()[-1])
            samples.setdefault(child, []).append(row)
            print(f"round {r} {child}: {row['ms']} ms "
                  f"({row['us_per_cell']} us/cell)", flush=True)

    report = {"backend": jax.default_backend(), "rounds": args.rounds,
              "legs": {}, "methodology": (
                  "per-leg single-program subprocesses, rounds "
                  "interleaved across the leg list; ms = min over "
                  "rounds of time_op best-observed, ms_median = median "
                  "over rounds of the drift-robust stat")}
    for child, rows in samples.items():
        best = min(rows, key=lambda r: r["ms"])
        report["legs"][child] = dict(
            best,
            ms=round(min(r["ms"] for r in rows), 4),
            ms_median=round(statistics.median(r["ms_median"]
                                              for r in rows), 4),
            rounds_ms=[r["ms"] for r in rows])
        c = report["legs"][child]
        c["us_per_cell"] = round(c["ms"] * 1e3 / c["cells"], 2)
        c["us_per_cell_median"] = round(c["ms_median"] * 1e3 / c["cells"],
                                        2)

    report["roofline"] = [
        roofline_row(geom, 768,
                     report["legs"][f"raw:{geom}:768"]["ms_median"],
                     report["legs"][f"no_median:{geom}:768"]["ms_median"],
                     report["legs"][f"prep:{geom}:768"]["ms_median"])
        for geom in GEOMETRIES]
    report["v5e_peaks"] = {"mxu_bf16_tflops": V5E_MXU_BF16 / 1e12,
                           "hbm_gbps": V5E_HBM / 1e9,
                           "vpu_tops_approx": V5E_VPU_APPROX / 1e12}

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()
