"""Training-pipeline throughput benchmark — interleaved A/B.

Measures, at the reference scale (48-patch steps, W=68):

  * host pipeline:   BalancedBatcher host ms/batch (warm cache) and the
    patch-batch device step time (flagship Lemaire-MTL),
  * device pipeline: AudioCropBatcher host ms/batch and the fused
    audio->features->train device step time for EVERY MTL model family
    (Lemaire / Doukhan / Papakostas / Jang, each with its own featName
    preset and optimizer),

and reports the steady-state steps/s of each (host and device legs
overlap through the prefetcher, so throughput = 1/max(leg)).

Methodology (the round-1 lesson, NOTES.md): the tunneled chip drifts
between multi-minute fast/slow states, so host and device legs are
measured INTERLEAVED across R rounds — every leg sampled once per round,
rounds cycling A/B/A/B — and each leg reports its per-round samples plus
the median.  The speedup is computed per round from matched samples and
reported as the median of per-round speedups, so no leg can be compared
against another leg's drift-degraded sample.

    python tools/bench_pipeline.py --out PIPELINE_bench.json
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

MTL_MODELS = ("Lemaire_et_al_MTL", "Doukhan_et_al_MTL",
              "Papakostas_et_al_MTL", "Jang_et_al_MTL")


def host_ms_per_batch(it, n=20):
    t0 = time.perf_counter()
    for _ in range(n):
        next(it)
    return (time.perf_counter() - t0) / n * 1e3


def device_ms(carry_fn, carry, iters=8):
    carry = carry_fn(carry)  # re-sync device before timing
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = carry_fn(carry)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="PIPELINE_bench.json")
    p.add_argument("--root", default="/tmp/pipe_bench_corpus")
    p.add_argument("--rounds", type=int, default=5)
    args = p.parse_args(argv)

    from sm_hpss_mtl_tpu.data import make_toy_musan
    from sm_hpss_mtl_tpu.data.audiostream import (AudioCache,
                                                  AudioCropBatcher)
    from sm_hpss_mtl_tpu.data.batcher import BalancedBatcher, BatcherConfig
    from sm_hpss_mtl_tpu.data.featurize import FeatureConfig, Featurizer
    from sm_hpss_mtl_tpu.data.folds import create_cv_folds, get_train_test_files
    from sm_hpss_mtl_tpu.models import get_model
    from sm_hpss_mtl_tpu.train import TrainState, for_model
    from sm_hpss_mtl_tpu.train.config import ExperimentConfig
    from sm_hpss_mtl_tpu.train.endtoend import (device_featurize_patches,
                                                make_audio_train_step)
    from sm_hpss_mtl_tpu.train.state import make_train_step

    if not os.path.exists(os.path.join(args.root, "music")):
        make_toy_musan(args.root, n_per_class=12, duration_s=12.0)
    cv = create_cv_folds(args.root, seed=0)
    files, _ = get_train_test_files(
        cv, 0, class_names=["music", "speech", "speech+music"])

    rng = jax.random.PRNGKey(0)
    report = {"backend": jax.default_backend(), "batch_patches": 48,
              "patch_size": 68, "rounds": args.rounds,
              "methodology": "interleaved rounds; median per leg; "
                             "speedup = median of per-round matched "
                             "device/host ratios"}

    # ---- host pipeline setup (flagship Lemaire-MTL) -----------------------
    cfg = FeatureConfig(feat_name="LogMelHarmPercSpec", n_mels=120)
    spec = get_model("Lemaire_et_al_MTL")
    opt, _ = for_model("Lemaire_et_al_MTL", tr_steps=14000)
    fz = Featurizer(cfg, cache_dir=os.path.join(args.root, "featcache"))
    bcfg = BatcherConfig(batch_size=16, patch_size=68, patch_shift=68,
                         feat_name=cfg.feat_name, input_kind="time_mel",
                         augment_noise=False, seed=0)
    host_it = iter(BalancedBatcher(fz, args.root, files, bcfg))
    host_ms_per_batch(host_it, n=5)  # warm the feature cache

    x, labels = next(host_it)
    x = jnp.asarray(x)
    labels = {k: jnp.asarray(v) for k, v in labels.items()}
    state = TrainState.create(spec.module, opt, x, rng)
    step = make_train_step(spec.module, opt, mtl=True, augment_noise=True)

    def host_carry(c):
        st, xx = c
        st2, metrics = step(st, xx, labels, rng)
        # data-dependent perturbation: keeps the step un-hoistable
        return (st2, xx * (1.0 + 1e-12 * metrics["loss"]))

    host_state = (state, x)
    host_state = host_carry(host_state)  # compile

    # ---- device pipeline setup (all MTL families) -------------------------
    cache = AudioCache(cache_dir=os.path.join(args.root, "audiocache"))
    ab = AudioCropBatcher(cache, args.root, files, cfg, clips_per_class=4,
                          n_patches_per_clip=4, patch_size=68, seed=0)
    dev_it = iter(ab)
    host_ms_per_batch(dev_it, n=5)  # warm the audio cache
    report["clip_samples"] = ab.L
    report["clips_per_step"] = 3 * 4

    dev_states, dev_steps = {}, {}
    for model in MTL_MODELS:
        mcfg = ExperimentConfig(model=model).feature_config()
        mels_kw = {"n_mels": mcfg.n_mels} if mcfg.n_mels > 0 else {}
        mspec = get_model(model, **mels_kw)
        mopt, _ = for_model(model, tr_steps=14000)
        kind = "time_mel" if model.startswith("Lemaire") else "image"
        # per-model batcher: clip length L depends on the preset's n_fft
        mb = AudioCropBatcher(cache, args.root, files, mcfg,
                              clips_per_class=4, n_patches_per_clip=4,
                              patch_size=68, seed=0)
        audio, clabels = next(iter(mb))
        audio = jnp.asarray(audio)
        clabels = {k: jnp.asarray(v) for k, v in clabels.items()}
        sample = device_featurize_patches(audio, mcfg, patch_size=68,
                                          patch_shift=68, input_kind=kind)
        mstate = TrainState.create(mspec.module, mopt, sample, rng)
        astep = make_audio_train_step(mspec.module, mopt, mcfg,
                                      patch_size=68, patch_shift=68,
                                      mtl=True, augment_noise=True,
                                      input_kind=kind)

        def dev_carry(c, _astep=astep, _labels=clabels):
            st, aa = c
            st2, metrics = _astep(st, aa, _labels, rng)
            return (st2, aa * (1.0 + 1e-12 * metrics["loss"]))

        dev_states[model] = dev_carry((mstate, audio))  # compile
        dev_steps[model] = dev_carry

    # ---- interleaved measurement rounds -----------------------------------
    samples = {"host_batcher_ms": [], "host_device_step_ms": [],
               "device_host_ms": []}
    for model in MTL_MODELS:
        samples[f"device_fused_step_ms_{model}"] = []
    for _ in range(args.rounds):
        samples["host_batcher_ms"].append(host_ms_per_batch(host_it))
        samples["host_device_step_ms"].append(
            device_ms(host_carry, host_state))
        samples["device_host_ms"].append(host_ms_per_batch(dev_it))
        for model in MTL_MODELS:
            samples[f"device_fused_step_ms_{model}"].append(
                device_ms(dev_steps[model], dev_states[model]))

    for k, v in samples.items():
        report[k] = round(statistics.median(v), 3)
        report[k + "_samples"] = [round(s, 3) for s in v]

    # per-round matched speedup (flagship model)
    flag = "device_fused_step_ms_Lemaire_et_al_MTL"
    per_round = []
    for r in range(args.rounds):
        host_bound = max(samples["host_batcher_ms"][r],
                         samples["host_device_step_ms"][r])
        dev_bound = max(samples["device_host_ms"][r], samples[flag][r])
        per_round.append(host_bound / dev_bound)
    report["host_steps_per_s"] = round(
        1e3 / max(report["host_batcher_ms"], report["host_device_step_ms"]), 1)
    report["device_steps_per_s"] = round(
        1e3 / max(report["device_host_ms"], report[flag]), 1)
    for model in MTL_MODELS:
        report[f"device_steps_per_s_{model}"] = round(
            1e3 / max(report["device_host_ms"],
                      report[f"device_fused_step_ms_{model}"]), 1)
    report["speedup_per_round"] = [round(s, 1) for s in per_round]
    report["speedup"] = round(statistics.median(per_round), 1)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
