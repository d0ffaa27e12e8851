"""Streaming-segmentation serving benchmark (VERDICT r3 next #5).

The reference's multi-hour broadcast use case
(``/root/reference/DAFx12_Speech_Music_Detection_B3_MTL_v2.py:634-676``)
is implemented twice in ``eval/segment.py`` — the reference-parity slab
loop (10,000-frame chunks, shift-1 dense windows, host window
extraction) and the single-``lax.scan`` program (one dispatch per
broadcast, on-device window extraction).  Both are correctness-tested;
this tool produces the missing TPU throughput artifact:

  * audio-hours/sec and real-time factor for the dense-prediction stage
    of each driver (warm, compile excluded; compile time reported),
  * the fused-frontend featurization stage of the same broadcast,
  * the combined serving rate (featurize + predict in sequence).

Timing: whole-pass wall clock (seconds-scale passes dwarf the ~30 ms
tunnel dispatch noise that forces chained differencing for sub-ms
programs), min + median over repeats.  Each leg runs in its own
single-program subprocess (NOTES r3 contamination rule).

    python tools/bench_serving.py --out SERVING_bench.json
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

SR = 16000
HOP = 160
N_MELS = 120
W = 68
CHUNK = 10000  # the reference's slab size


def broadcast_audio(hours: float) -> np.ndarray:
    """Synthetic broadcast: alternating speech-ish (pulsed noise) and
    music-ish (tone stack) minutes, like the radio scenarios."""
    n = int(hours * 3600 * SR)
    rng = np.random.default_rng(0)
    t = np.arange(n, dtype=np.float32) / SR
    tones = sum(np.sin(2 * np.pi * f * t) for f in (220.0, 330.0, 440.0))
    noise = rng.standard_normal(n).astype(np.float32)
    gate = (np.sin(2 * np.pi * t / 120.0) > 0).astype(np.float32)
    return (0.3 * tones * gate + 0.2 * noise * (1 - gate)).astype(np.float32)


def featuregram_of(audio: np.ndarray, device_out: bool = False):
    # Serving featurization = the slabbed fixed-shape path (at most two
    # compiled programs per config regardless of broadcast length; the
    # whole-signal featuregram would pay a fresh multi-second XLA
    # compile per distinct duration — 27 s measured at 0.5 h).
    # device_out keeps the featuregram on the chip for the fused
    # serve_dev leg (only audio goes up, probabilities come down).
    from sm_hpss_mtl_tpu.ops.featuregram import featuregram_slabbed
    return featuregram_slabbed(
        np.asarray(audio, np.float32), feat_name="LogMelHarmPercSpec",
        n_mels=N_MELS, use_pallas=jax.default_backend() == "tpu",
        device_out=device_out)


def make_segmenter(use_scan: bool):
    from sm_hpss_mtl_tpu.eval.segment import StreamingSegmenter
    from sm_hpss_mtl_tpu.models import get_model
    from sm_hpss_mtl_tpu.train import TrainState, for_model, make_predict

    spec = get_model("Lemaire_et_al_MTL")
    opt, _ = for_model("Lemaire_et_al_MTL", tr_steps=1000)
    sample = jnp.zeros((2, W, 2 * N_MELS), jnp.float32)
    state = TrainState.create(spec.module, opt, sample,
                              jax.random.PRNGKey(0))
    predict = make_predict(spec.module)
    return StreamingSegmenter(
        predict_fn=lambda x: predict(state, x), patch_size=W,
        chunk_frames=CHUNK, input_kind="time_mel",
        feat_name="LogMelHarmPercSpec", use_scan=use_scan)


def timed(fn, repeats: int):
    """(first_s, [warm_s...]) — first call includes compilation."""
    t0 = time.perf_counter()
    fn()
    first = time.perf_counter() - t0
    warm = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        warm.append(time.perf_counter() - t0)
    return first, warm


def _link_probe(nbytes_up: int, nbytes_down: int,
                chunk_mb: float = 16.0) -> dict:
    """Host->device and device->host transfer times for the leg's actual
    byte volumes, so the report can split chip rate from link rate (a
    co-located TPU host moves these bytes over PCIe at GB/s —
    SCALE_r4.json 'diagnosis').

    Probed at SLAB granularity (~16 MiB chunks, min of 3, scaled to the
    leg's volume): the legs move data slab-by-slab, and the tunnel's
    one-shot rate for multi-100 MB arrays (~7 MB/s) is far below the
    pipelined per-slab rate the passes actually sustain (~50 MB/s) —
    the round-0 one-shot probe overestimated link time beyond the
    measured whole-pass wall clock."""
    def rate(nbytes: int, transfer) -> float:
        if nbytes <= 0:
            return 0.0
        n = max(nbytes // 4, 1)
        chunk = min(max(int(chunk_mb * (1 << 20)) // 4, 1), n)
        t_chunk = min(transfer(chunk) for _ in range(3))
        return t_chunk * (n / chunk)

    def up(n):
        x = np.zeros(n, np.float32)
        t0 = time.perf_counter()
        d = jnp.asarray(x)
        float(d[-1])                     # force arrival
        return time.perf_counter() - t0

    def down(n):
        d = jnp.zeros(n, jnp.float32) + 1.0
        float(d[-1])                     # force materialization
        t0 = time.perf_counter()
        np.asarray(d)
        return time.perf_counter() - t0

    return {"link_up_s": round(rate(nbytes_up, up), 3),
            "link_down_s": round(rate(nbytes_down, down), 3)}


def run_child(leg: str, hours: float, repeats: int):
    audio = broadcast_audio(hours)

    if leg == "featurize":
        def once():
            fv = featuregram_of(audio)
            return fv
        first, warm = timed(once, repeats)
        n_frames = 1 + (len(audio) - 400) // HOP
        # Bytes this leg moves over the link per pass: audio up, fv down.
        link = _link_probe(audio.nbytes, 2 * N_MELS * n_frames * 4)
    elif leg == "serve_dev":
        # The TPU-native end-to-end serving chain: slab-featurize with
        # the featuregram assembled ON DEVICE, scan segmentation over
        # the resident array, fetch only the probability tracks.  Link
        # traffic per pass = raw audio up + (n_windows, heads) down.
        seg = make_segmenter(use_scan=True)

        def once():
            fv = featuregram_of(audio, device_out=True)
            tracks = seg.frame_probabilities(fv)
            return {k: float(np.sum(v)) for k, v in tracks.items()}
        first, warm = timed(once, repeats)
        n_frames = 1 + (len(audio) - 400) // HOP
        n_windows = n_frames - W + 1
        link = _link_probe(audio.nbytes, n_windows * 5 * 4)
    else:
        seg = make_segmenter(use_scan=(leg == "scan"))
        fv = featuregram_of(audio)
        n_frames = fv.shape[1]

        def once():
            tracks = seg.frame_probabilities(fv)
            # Force completion of every head.
            return {k: float(np.sum(v)) for k, v in tracks.items()}
        first, warm = timed(once, repeats)
        n_windows = n_frames - W + 1
        if leg == "scan":
            up = fv.nbytes                       # featuregram, put once
        else:
            # shift-1 dense windows shipped per slab: W-fold duplication.
            up = n_windows * fv.shape[0] * W * 4
        link = _link_probe(up, n_windows * 5 * 4)

    best, med = min(warm), statistics.median(warm)
    link_s = link["link_up_s"] + link["link_down_s"]
    row = {"leg": leg, "hours": hours, "n_frames": n_frames,
           "first_s": round(first, 3),
           "warm_s": [round(t, 3) for t in warm],
           "best_s": round(best, 3), "median_s": round(med, 3),
           "audio_h_per_s": round(hours / best, 3),
           "audio_h_per_s_median": round(hours / med, 3),
           "realtime_factor": round(hours * 3600 / best, 1),
           **link, "link_share": round(min(link_s / best, 1.0), 3),
           # Chip-rate gauge; meaningless when the probe says the pass
           # was ~all link (a co-located host would re-measure it).
           "audio_h_per_s_ex_link": (
               round(hours / (best - link_s), 3)
               if best - link_s > 0.05 * best else None)}
    print(json.dumps(row))
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "SERVING_bench.json"))
    p.add_argument("--jax-cache", default="/tmp/serving_jaxcache")
    p.add_argument("--hours", type=float, nargs="*", default=[0.5, 2.0])
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--legs", default="featurize,loop,scan",
                   help="comma list; the slab loop ships W-fold "
                        "duplicated windows (47 GB/pass at 2 h on this "
                        "link) — cap it to short broadcasts")
    p.add_argument("--merge", action="store_true",
                   help="merge new legs into an existing --out report")
    p.add_argument("--child", default=None, help="internal: 'leg:hours'")
    args = p.parse_args(argv)

    if args.jax_cache:
        jax.config.update("jax_compilation_cache_dir", args.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.child:
        leg, hours = args.child.split(":")
        run_child(leg, float(hours), args.repeats)
        return

    legs = [(leg, h) for h in args.hours
            for leg in args.legs.split(",")]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    samples = {}
    for r in range(args.rounds):
        for leg, hours in legs:
            child = f"{leg}:{hours}"
            cmd = [sys.executable, os.path.abspath(__file__), "--child",
                   child, "--jax-cache", args.jax_cache,
                   "--repeats", str(args.repeats)]
            proc = subprocess.run(cmd, cwd=REPO, env=env,
                                  capture_output=True, text=True,
                                  timeout=3600)
            if proc.returncode != 0:
                raise RuntimeError(f"child {child} failed\n"
                                   f"{proc.stdout[-2000:]}\n"
                                   f"{proc.stderr[-2000:]}")
            row = json.loads(proc.stdout.strip().splitlines()[-1])
            samples.setdefault(child, []).append(row)
            print(f"round {r} {child}: best {row['best_s']} s "
                  f"({row['audio_h_per_s']} h/s, "
                  f"RTF {row['realtime_factor']})", flush=True)

    report = {"backend": jax.default_backend(),
              "model": "Lemaire_et_al_MTL", "chunk_frames": CHUNK,
              "patch_shift": 1, "rounds": args.rounds, "legs": {},
              "methodology": (
                  "whole-pass wall clock (warm; first_s includes "
                  "compile), per-leg single-program subprocesses, "
                  "rounds interleaved; shift-1 dense prediction at the "
                  "reference chunk size. link_* fields: measured "
                  "host<->device transfer time for the leg's actual "
                  "byte volumes, probed at slab granularity (~16 MiB "
                  "chunks — the tunnel sustains ~50 MB/s pipelined; "
                  "one-shot multi-100MB transfers are far slower). "
                  "audio_h_per_s_ex_link is the chip-rate gauge (a "
                  "co-located TPU host moves the same bytes at GB/s); "
                  "it is null when the pass was ~all link")}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            report["legs"] = json.load(f).get("legs", {})
    for child, rows in samples.items():
        best = min(r["best_s"] for r in rows)
        med = statistics.median([r["median_s"] for r in rows])
        hours = rows[0]["hours"]
        report["legs"][child] = dict(
            rows[0], best_s=round(best, 3), median_s=round(med, 3),
            audio_h_per_s=round(hours / best, 3),
            audio_h_per_s_median=round(hours / med, 3),
            realtime_factor=round(hours * 3600 / best, 1),
            rounds_best_s=[r["best_s"] for r in rows])
    # Combined serving rate: featurize + predict in sequence.
    for h in args.hours:
        f = report["legs"].get(f"featurize:{h}")
        for drv in ("loop", "scan"):
            d = report["legs"].get(f"{drv}:{h}")
            if f and d:
                tot = f["best_s"] + d["best_s"]
                report["legs"][f"serve_{drv}:{h}"] = {
                    "leg": f"serve_{drv}", "hours": h,
                    "best_s": round(tot, 3),
                    "audio_h_per_s": round(h / tot, 3),
                    "realtime_factor": round(h * 3600 / tot, 1)}

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()
