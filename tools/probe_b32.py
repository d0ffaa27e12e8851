"""Locate the residual B32 end-to-end gap (VERDICT r4 next #5).

FRONTEND_bench r4 shows the fused kernel flat per-cell across
geometries, so the 32x30 shortfall (61.7 vs 73.9 sustained audio-h/s)
lives in the XLA-side path around the kernel.  The decomposition rows
point at the superblock PREP: ``prep:16x30`` measures 0.04 ms while
``prep:32x30`` measures 1.08 ms and ``prep:16x120`` 3.6 ms — 7-12x the
HBM copy bound for what is one pad+reshape plus a ~3% halo stack, and
wildly superlinear in total audio.

This tool pins down where that growth lives and whether a dispatch
shape change recovers it:

* ``prep_*`` legs: the pad alone, pad+reshape (superblocks), the halo
  stack alone, and the full ``_audio_superblocks`` — each at B16x30 /
  B32x30 / B16x120.
* ``whole`` vs ``time{1,2}`` vs ``batch{8,16}`` legs at 32x30: the
  public path with time-segment sub-calls (chunk_tiles) vs
  batch-segment sub-calls vs the single (32, 4) grid.
* candidate-fix legs: ``prep_halos_ss`` / ``prep_full_ss`` build the
  halo array with ONE pad+reshape+slice (layout-preserving strided
  copy) instead of the nT-slice python ``jnp.stack``; ``prep_full_bar``
  keeps the stack but puts an ``optimization_barrier`` between the
  superblock materialization and the halo extraction (testing whether
  the cost is a fusion cliff between the two).  ``whole_ss`` /
  ``time4_ss`` run the real frontend end-to-end with the strided-slice
  prep monkeypatched in.

Same methodology as bench_frontend: each leg in its own subprocess,
rounds interleaved, chained-iteration timing.

    python tools/probe_b32.py --out PROBE_b32.json
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
N_FFT, WIN, HOP, L_HARM, L_PERC, N_MELS = 400, 400, 160, 21, 11, 120


def audio_for(geom):
    B, seconds = GEOMETRIES[geom]
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.standard_normal((B, int(seconds * 16000))).astype(np.float32))


def _superblocks_ss(y, *, T, tile_t, hop, J, ht, halo_in_audio=False):
    """``_audio_superblocks`` with the halo stack replaced by one
    pad+reshape+slice: rows ``[(t+1)*tile_t, (t+1)*tile_t + tail_pad)``
    of ``sb`` are exactly rows ``[t*tile_t, t*tile_t + tail_pad)`` of
    ``sb[:, tile_t:]``, so padding that shifted view to ``nT*tile_t``
    rows and reshaping ``(B, nT, tile_t, hop)`` makes the halo of every
    tile the leading ``tail_pad`` rows of its chunk — one strided copy,
    no per-tile ``jnp.stack``."""
    B, N = y.shape
    nT = -(-T // tile_t)
    tail = 2 * ht + J - 1
    tail_pad = 8 * -(-tail // 8)
    NSB = nT * tile_t + tail_pad
    pad_l = 0 if halo_in_audio else ht * hop
    pad_r = NSB * hop - pad_l - N
    yp = jnp.pad(y.astype(jnp.float32), ((0, 0), (pad_l, pad_r)))
    sb = yp.reshape(B, NSB, hop)
    if tail_pad <= tile_t:
        shifted = jnp.pad(sb[:, tile_t:],
                          ((0, 0), (0, tile_t - tail_pad), (0, 0)))
        halos = shifted.reshape(B, nT, tile_t, hop)[:, :, :tail_pad]
    else:   # tiny-tile fallback: the original per-tile stack
        halos = jnp.stack(
            [sb[:, (t + 1) * tile_t:(t + 1) * tile_t + tail_pad]
             for t in range(nT)], axis=1)
    return sb, halos, nT, tile_t + tail_pad


def leg_step(leg: str, geom: str):
    from sm_hpss_mtl_tpu.ops import frontend_pallas as fp
    from sm_hpss_mtl_tpu.ops.mel import mel_filterbank

    if leg.endswith("_ss"):
        fp._audio_superblocks = _superblocks_ss
        leg = leg[:-len("_ss")]

    y = audio_for(geom)
    B, seconds = GEOMETRIES[geom]
    T = 1 + (int(seconds * 16000) - N_FFT) // HOP
    tile = fp._pick_tile(T, 768)
    ht = L_HARM // 2
    J = -(-N_FFT // HOP)
    interp = jax.default_backend() != "tpu"
    M = jnp.asarray(mel_filterbank(16000, N_FFT, N_MELS), jnp.float32)
    kw = dict(n_fft=N_FFT, win_length=WIN, hop_length=HOP, l_harm=L_HARM,
              l_perc=L_PERC, interpret=interp)

    if leg.startswith("prep"):
        nT = -(-T // tile)
        tail = 2 * ht + J - 1
        tail_pad = 8 * -(-tail // 8)
        NSB = nT * tile + tail_pad
        pad_l = ht * HOP
        pad_r = NSB * HOP - pad_l - y.shape[-1]

        if leg == "prep_pad":
            @jax.jit
            def step(a):
                yp = jnp.pad(a, ((0, 0), (pad_l, pad_r)))
                return a * (1.0 + 1e-12 * jnp.sum(yp))
        elif leg == "prep_sb":
            @jax.jit
            def step(a):
                yp = jnp.pad(a, ((0, 0), (pad_l, pad_r)))
                sb = yp.reshape(a.shape[0], NSB, HOP)
                return a * (1.0 + 1e-12 * jnp.sum(sb))
        elif leg == "prep_halos":
            @jax.jit
            def step(a):
                yp = jnp.pad(a, ((0, 0), (pad_l, pad_r)))
                sb = yp.reshape(a.shape[0], NSB, HOP)
                halos = jnp.stack(
                    [sb[:, (t + 1) * tile:(t + 1) * tile + tail_pad]
                     for t in range(nT)], axis=1)
                return a * (1.0 + 1e-12 * jnp.sum(halos))
        elif leg == "prep_full":
            @jax.jit
            def step(a):
                sb, halos, _, _ = fp._audio_superblocks(
                    a, T=T, tile_t=tile, hop=HOP, J=J, ht=ht)
                return a * (1.0 + 1e-12 * (jnp.sum(sb) + jnp.sum(halos)))
        elif leg == "prep_full_bar":
            @jax.jit
            def step(a):
                yp = jnp.pad(a, ((0, 0), (pad_l, pad_r)))
                sb = yp.reshape(a.shape[0], NSB, HOP)
                sb = jax.lax.optimization_barrier(sb)
                halos = jnp.stack(
                    [sb[:, (t + 1) * tile:(t + 1) * tile + tail_pad]
                     for t in range(nT)], axis=1)
                return a * (1.0 + 1e-12 * (jnp.sum(sb) + jnp.sum(halos)))
        else:
            raise ValueError(leg)
        return step, y

    # Public-path dispatch variants (32x30 unless geom says otherwise).
    def consume(a, H, P):
        delta = jnp.mean(H + P, axis=(-2, -1))[..., None]
        return a + 1e-6 * delta

    if leg == "whole":
        def step(a):
            H, P = fp.stft_hpss_mel(a, M, tile_t=768, chunk_tiles=None,
                                    **kw)
            return consume(a, H, P)
        return step, y

    if leg.startswith("time"):
        ct = int(leg[len("time"):])
        def step(a):
            H, P = fp.stft_hpss_mel(a, M, tile_t=768, chunk_tiles=ct, **kw)
            return consume(a, H, P)
        return step, y

    if leg.startswith("batch"):
        bs = int(leg[len("batch"):])
        def step(a):
            outs = [fp.stft_hpss_mel(a[i:i + bs], M, tile_t=768,
                                     chunk_tiles=None, **kw)
                    for i in range(0, a.shape[0], bs)]
            H = jnp.concatenate([h for h, _ in outs], axis=0)
            P = jnp.concatenate([p for _, p in outs], axis=0)
            return consume(a, H, P)
        return step, y

    raise ValueError(leg)


def run_child(leg: str, geom: str):
    from sm_hpss_mtl_tpu.utils.benchmarking import time_op
    step, carry = leg_step(leg, geom)
    t_min = time_op(step, carry, iters=(3, 13), repeats=4)
    t_med = time_op(step, carry, iters=(3, 13), repeats=4, stat="median")
    row = {"leg": leg, "geom": geom,
           "ms": round(t_min * 1e3, 4), "ms_median": round(t_med * 1e3, 4)}
    print(json.dumps(row))
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "PROBE_b32.json"))
    p.add_argument("--jax-cache", default="/tmp/frontend_jaxcache")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--child", default=None, help="internal: 'leg:geom'")
    args = p.parse_args(argv)

    if args.jax_cache:
        jax.config.update("jax_compilation_cache_dir", args.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.child:
        leg, geom = args.child.split(":")
        run_child(leg, geom)
        return

    legs = [(leg, geom) for geom, leg in itertools.product(
        GEOMETRIES, ("prep_pad", "prep_sb", "prep_halos", "prep_full",
                     "prep_full_bar", "prep_full_ss"))]
    legs += [(leg, "32x30") for leg in
             ("whole", "time1", "time2", "time4", "batch8", "batch16",
              "whole_ss")]
    legs += [("time2", "16x120"), ("time4", "16x120"), ("whole", "16x30"),
             ("time4_ss", "16x120"), ("whole_ss", "16x30")]

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    samples = {}
    for r in range(args.rounds):
        for leg, geom in legs:
            child = f"{leg}:{geom}"
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
            print(f"round {r} {child}: {row['ms']} ms", flush=True)

    report = {"backend": jax.default_backend(), "rounds": args.rounds,
              "legs": {}, "methodology": (
                  "per-leg single-program subprocesses, rounds "
                  "interleaved; chained-iteration timing "
                  "(utils/benchmarking.py)")}
    for child, rows in samples.items():
        report["legs"][child] = {
            "ms": round(min(r["ms"] for r in rows), 4),
            "ms_median": round(statistics.median(r["ms_median"]
                                                 for r in rows), 4),
            "rounds_ms": [r["ms"] for r in rows]}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()
