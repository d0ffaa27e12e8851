"""Training-pipeline throughput benchmark (VERDICT r1 weak #2).

Measures, at the reference scale (48-patch steps, W=68, Lemaire-MTL):

  * host pipeline:   BalancedBatcher host ms/batch (warm cache) and the
    patch-batch device step time,
  * device pipeline: AudioCropBatcher host ms/batch and the fused
    audio->features->train device step time,

and reports the steady-state steps/s of each (host and device legs
overlap through the prefetcher, so throughput = 1/max(leg)).

    python tools/bench_pipeline.py --out PIPELINE_bench.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def host_ms_per_batch(it, n=30, warmup=5):
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n):
        next(it)
    return (time.perf_counter() - t0) / n * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="PIPELINE_bench.json")
    p.add_argument("--root", default="/tmp/pipe_bench_corpus")
    args = p.parse_args(argv)

    from sm_hpss_mtl_tpu.data import make_toy_musan
    from sm_hpss_mtl_tpu.data.audiostream import (AudioCache,
                                                  AudioCropBatcher)
    from sm_hpss_mtl_tpu.data.batcher import BalancedBatcher, BatcherConfig
    from sm_hpss_mtl_tpu.data.featurize import FeatureConfig, Featurizer
    from sm_hpss_mtl_tpu.data.folds import create_cv_folds, get_train_test_files
    from sm_hpss_mtl_tpu.models import get_model
    from sm_hpss_mtl_tpu.train import TrainState, for_model
    from sm_hpss_mtl_tpu.train.endtoend import (device_featurize_patches,
                                                make_audio_train_step)
    from sm_hpss_mtl_tpu.train.state import make_train_step
    from sm_hpss_mtl_tpu.utils.benchmarking import time_op

    if not os.path.exists(os.path.join(args.root, "music")):
        make_toy_musan(args.root, n_per_class=12, duration_s=12.0)
    cv = create_cv_folds(args.root, seed=0)
    files, _ = get_train_test_files(
        cv, 0, class_names=["music", "speech", "speech+music"])

    cfg = FeatureConfig(feat_name="LogMelHarmPercSpec", n_mels=120)
    rng = jax.random.PRNGKey(0)
    spec = get_model("Lemaire_et_al_MTL")
    opt, _ = for_model("Lemaire_et_al_MTL", tr_steps=14000)
    report = {"backend": jax.default_backend(), "batch_patches": 48,
              "patch_size": 68}

    # ---- host pipeline ----------------------------------------------------
    fz = Featurizer(cfg, cache_dir=os.path.join(args.root, "featcache"))
    bcfg = BatcherConfig(batch_size=16, patch_size=68, patch_shift=68,
                         feat_name=cfg.feat_name, input_kind="time_mel",
                         augment_noise=False, seed=0)
    hb = BalancedBatcher(fz, args.root, files, bcfg)
    report["host_batcher_ms"] = round(host_ms_per_batch(iter(hb)), 3)

    x, labels = next(iter(hb))
    x = jnp.asarray(x)
    labels = {k: jnp.asarray(v) for k, v in labels.items()}
    state = TrainState.create(spec.module, opt, x, rng)
    step = make_train_step(spec.module, opt, mtl=True, augment_noise=True)

    def carry(c):
        st, xx = c
        st2, metrics = step(st, xx, labels, rng)
        return (st2, xx * (1.0 + 1e-12 * metrics["loss"]))

    t = time_op(carry, (state, x), iters=(2, 10), repeats=3)
    report["host_device_step_ms"] = round(t * 1e3, 3)

    # ---- device pipeline --------------------------------------------------
    cache = AudioCache(cache_dir=os.path.join(args.root, "audiocache"))
    ab = AudioCropBatcher(cache, args.root, files, cfg, clips_per_class=4,
                          n_patches_per_clip=4, patch_size=68, seed=0)
    report["device_host_ms"] = round(host_ms_per_batch(iter(ab)), 3)
    report["clip_samples"] = ab.L
    report["clips_per_step"] = 3 * 4

    audio, clabels = next(iter(ab))
    audio = jnp.asarray(audio)
    clabels = {k: jnp.asarray(v) for k, v in clabels.items()}
    sample = device_featurize_patches(audio, cfg, patch_size=68,
                                      patch_shift=68)
    state2 = TrainState.create(spec.module, opt, sample, rng)
    astep = make_audio_train_step(spec.module, opt, cfg, patch_size=68,
                                  patch_shift=68, mtl=True,
                                  augment_noise=True)

    def carry2(c):
        st, aa = c
        st2, metrics = astep(st, aa, clabels, rng)
        # Perturb the audio by the (data-dependent) loss so the featurize
        # subgraph cannot be hoisted out of the timing loop as
        # loop-invariant code.
        return (st2, aa * (1.0 + 1e-12 * metrics["loss"]))

    t2 = time_op(carry2, (state2, audio), iters=(2, 10), repeats=3)
    report["device_fused_step_ms"] = round(t2 * 1e3, 3)

    for k_pipe, legs in (("host", ("host_batcher_ms",
                                   "host_device_step_ms")),
                         ("device", ("device_host_ms",
                                     "device_fused_step_ms"))):
        bound = max(report[legs[0]], report[legs[1]])
        report[f"{k_pipe}_steps_per_s"] = round(1e3 / bound, 1)
    report["speedup"] = round(report["device_steps_per_s"]
                              / report["host_steps_per_s"], 1)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
