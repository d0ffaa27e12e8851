"""Headline benchmark: HPSS + featurization throughput per chip.

Measures the flagship feature pipeline — STFT -> fused-Pallas HPSS ->
mel -> log (LogMelHarmPercSpec, the proposed-work configuration) — in
audio-hours processed per second on the available accelerator, against a
single-thread CPU baseline running the numpy/scipy golden implementation
of the same librosa algorithms (the reference's compute path).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "audio_hours_per_sec",
   "vs_baseline": N}
where vs_baseline is the speedup over the CPU baseline (BASELINE.md
target: >= 100x per v5e chip).

Timing uses chained-iteration differencing (utils/benchmarking.py) since
this environment's tunneled TPU makes naive wall-clock timing
meaningless.
"""

import json
import statistics
import time

import numpy as np

import jax
import jax.numpy as jnp


def featurize_step(use_pallas: bool, dft_precision: str = "bf16x3"):
    from sm_hpss_mtl_tpu.ops import featuregram as fg

    def step(audio):
        fv = fg.featuregram(audio, feat_name="LogMelHarmPercSpec",
                            n_mels=120, use_pallas=use_pallas,
                            dft_precision=dft_precision)
        # Data-dependent carry with the input's shape: fold features back
        # into an audio-shaped perturbation so iterations chain.
        delta = jnp.mean(fv, axis=(-2, -1), keepdims=False)[..., None]
        return audio + 1e-6 * delta

    return step


def cpu_baseline_seconds(audio_np: np.ndarray) -> float:
    """Single-thread numpy/scipy featurization of one batch item
    (min of 3 runs to shed scheduler noise)."""
    from sm_hpss_mtl_tpu.ops import reference as ref

    x = audio_np[0]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        S = ref.stft_mag(x, 400, 400, 160)
        H, P = ref.hpss(S, 21, 11)
        fH = ref.power_to_db(ref.melspectrogram_from_S(H, 120) ** 2)
        fP = ref.power_to_db(ref.melspectrogram_from_S(P, 120) ** 2)
        np.concatenate([fH, fP], axis=0)
        best = min(best, time.perf_counter() - t0)
    return best * audio_np.shape[0]  # batch-equivalent


def main():
    from sm_hpss_mtl_tpu.utils.benchmarking import time_op

    B, seconds = 16, 30.0
    fs = 16000
    rng = np.random.default_rng(0)
    audio_np = rng.standard_normal((B, int(seconds * fs))).astype(np.float32)
    audio = jnp.asarray(audio_np)
    audio_hours = B * seconds / 3600.0

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    step = featurize_step(use_pallas=on_tpu)
    step_hi = featurize_step(use_pallas=on_tpu, dft_precision="highest")
    # Metric semantics: BEST-OBSERVED throughput (min time), consistent
    # with the min-over-repeats policy inside time_op — the chip's
    # capability, not the tunnel's weather.  The tunneled chip drifts
    # between multi-minute fast/slow states that min-over-repeats within
    # one round cannot shed (observed ±20% across runs); always run two
    # rounds and report both, so the min is visible rather than a
    # one-sided resample.  The bf16x3 and 'highest' DFT precisions are
    # measured INTERLEAVED within each round (precision-policy A/B —
    # see NOTES.md); the headline value is the bf16x3 default.
    import sys

    def note(msg):
        print(msg, file=sys.stderr, flush=True)

    # Geometry curve (VERDICT r3 next #2): the headline geometry
    # (B16 x 30 s = 64 grid cells) plus B32 x 30 s (128) and
    # B16 x 120 s (256), so the report shows the scaling curve, not
    # just the sweet spot.  All measured interleaved within each round.
    geos = {"32x30": (32, 30.0), "16x120": (16, 120.0)}
    geo_audio = {
        name: (jnp.asarray(rng.standard_normal(
                   (gb, int(gs * fs))).astype(np.float32)),
               gb * gs / 3600.0)
        for name, (gb, gs) in geos.items()}

    rounds, rounds_hi, sustained = [], [], []
    geo_rounds = {name: {"min": [], "median": []} for name in geos}
    for r in range(2):
        rounds.append(time_op(step, audio, iters=(3, 13), repeats=4))
        note(f"round {r} bf16x3: {audio_hours / rounds[-1]:.1f} h/s")
        rounds_hi.append(time_op(step_hi, audio, iters=(3, 13), repeats=4))
        note(f"round {r} highest: {audio_hours / rounds_hi[-1]:.1f} h/s")
        # Weather gauge: the drift-robust median-of-adjacent-pairs stat
        # (sustained throughput under the tunnel's current mix of
        # fast/slow states) alongside the best-observed headline.
        sustained.append(time_op(step, audio, iters=(3, 13), repeats=4,
                                 stat="median"))
        note(f"round {r} bf16x3 sustained: "
             f"{audio_hours / sustained[-1]:.1f} h/s")
        for name, (ga, gh) in geo_audio.items():
            geo_rounds[name]["min"].append(
                gh / time_op(step, ga, iters=(3, 13), repeats=4))
            geo_rounds[name]["median"].append(
                gh / time_op(step, ga, iters=(3, 13), repeats=4,
                             stat="median"))
            note(f"round {r} {name}: {geo_rounds[name]['min'][-1]:.1f} h/s "
                 f"(sustained {geo_rounds[name]['median'][-1]:.1f})")
    throughput = audio_hours / min(rounds)
    throughput_hi = audio_hours / min(rounds_hi)

    note("device rounds done; running CPU baseline")
    t_cpu = cpu_baseline_seconds(audio_np)
    cpu_throughput = audio_hours / t_cpu

    print(json.dumps({
        "metric": "hpss_featurize_throughput",
        "value": round(throughput, 2),
        "unit": "audio_hours_per_sec",
        "vs_baseline": round(throughput / cpu_throughput, 1),
        "rounds": [round(audio_hours / t, 2) for t in rounds],
        "value_dft_highest": round(throughput_hi, 2),
        "rounds_dft_highest": [round(audio_hours / t, 2)
                               for t in rounds_hi],
        "value_sustained_median": round(
            audio_hours / statistics.median(sustained), 2),
        "rounds_sustained": [round(audio_hours / t, 2)
                             for t in sustained],
        "geometries": {
            "16x30": {"value": round(throughput, 2),
                      "value_sustained_median": round(
                          audio_hours / statistics.median(sustained), 2)},
            **{name: {
                "value": round(max(v["min"]), 2),
                "value_sustained_median": round(
                    statistics.median(v["median"]), 2),
                "rounds": [round(x, 2) for x in v["min"]]}
               for name, v in geo_rounds.items()},
        },
    }))


if __name__ == "__main__":
    main()
