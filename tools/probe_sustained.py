"""Locate the frontend's residual superlinear growth (grid-size study).

FRONTEND_bench.json apportioned the fused frontend's per-audio-second
growth (3.61 -> 4.40 -> 5.19 us/audio-s at 1x/2x/4x audio) to the
DFT/mel/output phase: the median networks scale linearly and prep is
free in-program.  Because ``time_op`` chains its iterations inside a
jitted ``fori_loop``, even the small-geometry numbers are *sustained*
measurements — so the growth cannot be a burst-vs-steady-state clock
effect.  What remains is the size of a single ``pallas_call`` grid.

This probe compares, in one process with interleaved rounds:

  * **chained-small**: ``factor`` sequential 64-cell kernel calls
    (data-dependent, no overlap) inside ONE jitted step — same total
    audio, same dispatch pattern, small grids.
  * **big**: one kernel call over ``factor`` x the audio — one large
    grid.

If chained-small ~= factor x (single small time) and big is slower,
the degradation is internal to a large grid (output-buffer locality /
pipeline scheduling across a long grid), and chunking large inputs
into ~64-cell calls is a real lever.  If chained-small degrades to
match big, consecutive kernel executions themselves slow down and the
growth is intrinsic to sustained execution.

    python tools/probe_sustained.py --small 16 30 --factor 4
"""

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
N_FFT, WIN, HOP = 400, 400, 160
L_HARM, L_PERC = 21, 11   # the FRONTEND_bench constants
N_MELS = 120


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--small", type=int, nargs=2, default=[16, 30],
                   metavar=("B", "SECONDS"))
    p.add_argument("--factor", type=int, default=4)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--cap", type=int, default=768)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from sm_hpss_mtl_tpu.ops import frontend_pallas as fp
    from sm_hpss_mtl_tpu.ops.mel import mel_filterbank
    from sm_hpss_mtl_tpu.utils.benchmarking import time_op

    B, sec = args.small
    rng = np.random.default_rng(0)
    a_small = jnp.asarray(
        rng.standard_normal((B, int(sec * SR))).astype(np.float32))
    a_big = jnp.asarray(
        rng.standard_normal((B, int(sec * SR) * args.factor)).astype(
            np.float32))
    M = jnp.asarray(mel_filterbank(SR, N_FFT, N_MELS), jnp.float32)
    interp = jax.default_backend() != "tpu"
    kw = dict(n_fft=N_FFT, win_length=WIN, hop_length=HOP,
              l_harm=L_HARM, l_perc=L_PERC, power=2.0,
              tile_t=args.cap, interpret=interp)

    def small_once(a):
        H, P = fp.stft_hpss_mel(a, M, **kw)
        return a + 1e-6 * jnp.mean(H + P, axis=(-2, -1))[..., None]

    def chained_step(a):
        for _ in range(args.factor):
            a = small_once(a)
        return a

    def big_step(a):
        H, P = fp.stft_hpss_mel(a, M, **kw)
        return a + 1e-6 * jnp.mean(H + P, axis=(-2, -1))[..., None]

    legs = {"single_small": (small_once, a_small),
            "chained_small": (chained_step, a_small),
            "big": (big_step, a_big)}
    rows = {k: [] for k in legs}
    for r in range(args.rounds):
        for name, (step, carry) in legs.items():
            ms = time_op(step, carry, iters=(3, 13), repeats=4,
                         stat="median") * 1e3
            rows[name].append(round(ms, 4))
            print(f"round {r} {name}: {ms:.4f} ms", flush=True)

    med = {k: statistics.median(v) for k, v in rows.items()}
    lin = args.factor * med["single_small"]
    report = {
        "backend": jax.default_backend(),
        "small_geom": f"{B}x{sec}s", "factor": args.factor,
        "rounds": rows, "median_ms": med,
        "linear_extrapolation_ms": round(lin, 4),
        "chained_vs_linear": round(med["chained_small"] / lin, 3),
        "big_vs_chained": round(med["big"] / med["chained_small"], 3),
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
