"""Apportion the at-scale per-step wall time (SCALE_r4 follow-up).

SCALE_r4.json measured the full-fold rehearsal sustaining only
~4.6 / 5.4 steps/s (host / device pipeline) at reference-derived step
counts, vs ~0.5-3 ms microbenchmarked step times.  ``epoch_train_s``
covers ``next(train_iter)`` + the jitted step (``train/loop.py:98-109``),
so the gap lives in the input leg.  This tool measures, on the same
corpus and the same batcher settings the rehearsal used:

  * ``host_batch_ms``    — host-side ``next()`` on the raw batcher
  * ``batch_mb``         — bytes shipped to the device per step
  * ``transfer_ms``      — ``jax.device_put`` + forced arrival of one
                           batch (minus a resident-op baseline)
  * ``prefetched_ms``    — ``next()`` through ``DevicePrefetcher``
                           (background thread + device_put), arrival
                           forced — the actual input-leg ceiling
  * ``synthetic_put_ms`` — device_put of a synthetic 4 MiB array, the
                           raw link calibration

If ``transfer_ms`` dominates and matches the synthetic link rate, the
at-scale rate is a property of the tunneled single-chip environment
(host and TPU on different machines), not of the framework: on a
co-located TPU host the same device_put is PCIe/DMA at GB/s.

    python tools/diagnose_scale_step.py --root /tmp/scale_r4 --out -
"""

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _force(tree):
    """Force real arrival/completion on device, tunnel-honestly: fetch a
    scalar reduction back to host."""
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(tree)
    return float(sum(jnp.sum(x) for x in leaves
                     if hasattr(x, "dtype")).block_until_ready())


def _median_time(fn, n=12, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _tree_bytes(tree):
    import jax
    return sum(getattr(x, "nbytes", 0)
               for x in jax.tree_util.tree_leaves(tree))


def measure_iter(raw_iter, label):
    """host-side next(), bytes, explicit put+force, prefetched next()."""
    import jax

    from sm_hpss_mtl_tpu.data.prefetch import DevicePrefetcher

    host_ms = _median_time(lambda: next(raw_iter)) * 1e3
    batch = next(raw_iter)
    mb = _tree_bytes(batch) / 2**20

    # Resident-op baseline (dispatch + scalar fetch over the tunnel).
    resident = jax.device_put(batch)
    base_ms = _median_time(lambda: _force(resident)) * 1e3

    def put():
        _force(jax.device_put(batch))
    put_ms = _median_time(put) * 1e3 - base_ms

    pre = DevicePrefetcher(raw_iter)
    try:
        pre_ms = _median_time(lambda: _force(next(pre))) * 1e3 - base_ms
    finally:
        pre.close()
    row = {"host_batch_ms": round(host_ms, 2), "batch_mb": round(mb, 2),
           "force_baseline_ms": round(base_ms, 2),
           "transfer_ms": round(put_ms, 2),
           "prefetched_ms": round(pre_ms, 2)}
    print(f"{label}: {row}", flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/scale_r4")
    p.add_argument("--out", default="-")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from sm_hpss_mtl_tpu.cli.experiment import (class_names_for,
                                                load_or_create_folds,
                                                resolve_clip_patches,
                                                split_train_val)
    from sm_hpss_mtl_tpu.data import (BalancedBatcher, BatcherConfig,
                                      Featurizer, get_train_test_files)
    from sm_hpss_mtl_tpu.data.audiostream import AudioCache, AudioCropBatcher
    from sm_hpss_mtl_tpu.train import ExperimentConfig

    cfg = ExperimentConfig(
        model="Lemaire_et_al_MTL", data_root=args.root,
        feature_dir=os.path.join(args.root, "features"),
        output_dir=os.path.join(args.root, "results_diag"),
        epochs=1, batch_size=16, patch_size=68, patch_shift=68,
        seed=0)
    feat_cfg = cfg.feature_config()
    cv = load_or_create_folds(cfg)
    train_files, _ = get_train_test_files(
        cv, 0, class_names=class_names_for(cfg.n_classes))
    tr_files, _ = split_train_val(train_files, seed=cfg.seed)

    report = {"root": args.root, "backend": jax.default_backend(),
              "what": ("per-step input-leg decomposition on the SCALE_r4 "
                       "corpus; see module docstring")}

    # Raw link calibration: a synthetic array about one batch big.
    x = np.random.default_rng(0).standard_normal(2**20).astype(np.float32)
    base = jax.device_put(x)
    base_ms = _median_time(lambda: _force(base)) * 1e3
    syn_ms = _median_time(lambda: _force(jax.device_put(x))) * 1e3 - base_ms
    report["synthetic_put_4mb_ms"] = round(syn_ms, 2)
    report["synthetic_link_mb_s"] = round(4.0 / (syn_ms / 1e3), 1)
    print(f"synthetic 4 MiB put: {syn_ms:.1f} ms "
          f"({report['synthetic_link_mb_s']} MB/s)", flush=True)

    # --- device pipeline (AudioCropBatcher), rehearsal settings ---
    k = resolve_clip_patches(cfg, tr_files)
    clips = max(1, -(-cfg.batch_size // k))
    cache = AudioCache(cache_dir=os.path.join(
        args.root, "features_device", "audio_cache"),
        Tw=cfg.Tw, Ts=cfg.Ts)
    crop_iter = iter(AudioCropBatcher(
        cache, cfg.data_root, tr_files, feat_cfg, clips_per_class=clips,
        n_patches_per_clip=k, patch_size=cfg.patch_size,
        patch_shift=cfg.patch_shift, seed=100, min_crop_s=cfg.min_crop_s))
    report["device_pipeline"] = measure_iter(crop_iter, "device")
    report["device_pipeline"]["clip_patches"] = k

    # --- host pipeline (BalancedBatcher on the warm featuregram cache) ---
    fz = Featurizer(feat_cfg, cache_dir=os.path.join(
        cfg.feature_dir, cfg.model, feat_cfg.feat_name))
    bcfg = BatcherConfig(batch_size=cfg.batch_size,
                         patch_size=cfg.patch_size,
                         patch_shift=cfg.patch_shift,
                         feat_name=feat_cfg.feat_name,
                         input_kind=cfg.input_kind, seed=100)
    host_iter = iter(BalancedBatcher(fz, cfg.data_root, tr_files, bcfg))
    report["host_pipeline"] = measure_iter(host_iter, "host")

    # Implied vs measured sustained step rate.
    for key, scale_key in (("device_pipeline", 5.4), ("host_pipeline", 4.6)):
        leg = report[key]
        leg["implied_input_steps_per_s"] = round(
            1e3 / max(leg["prefetched_ms"], 1e-9), 1)
        leg["scale_r4_sustained_steps_per_s"] = scale_key

    text = json.dumps(report, indent=1)
    if args.out == "-":
        print(text)
    else:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
