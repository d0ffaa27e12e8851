"""Re-run the REAL_AUDIO device-pipeline arm on round-4 DEFAULTS.

Round 3 measured the small-corpus failure mode: the device pipeline at
``clip_patches=2`` scores 0.719 mean with two folds early-stop
collapsing, vs 0.797 at ``clip_patches=1`` (REAL_AUDIO.json
``tpu_device_pipeline``) — and the fix shipped as NOTES guidance, not
defaults.  Round 4 made ``clip_patches=0`` (adaptive) the default:
corpora whose smallest training class has <8*batch clips resolve to 1.
This tool re-runs the same protocol (real corpus from the reference's
own demo audio, 3 folds, 40 epochs x 30 steps, batch 8, patch 32/16,
seed 0, ``--pipeline device``) with NO clip_patches override, and
merges the result into REAL_AUDIO.json as
``tpu_device_pipeline_defaults_r4`` — proving a user running defaults
now gets the diverse (non-collapsing) regime.

    python tools/real_defaults.py
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/real_musan")
    ap.add_argument("--work", default="/tmp/real_defaults_r4")
    ap.add_argument("--out", default=os.path.join(REPO, "REAL_AUDIO.json"))
    ap.add_argument("--epochs", type=int, default=40)
    args = ap.parse_args(argv)

    if not os.path.exists(os.path.join(args.root, "music")):
        from tools.real_corpus import main as build
        build(["--out", args.root])

    import jax

    from sm_hpss_mtl_tpu.cli.experiment import (resolve_clip_patches,
                                                run_experiment)
    from sm_hpss_mtl_tpu.train import ExperimentConfig

    cfg = ExperimentConfig(
        model="Lemaire_et_al_MTL", data_root=args.root,
        feature_dir=os.path.join(args.work, "features"),
        output_dir=os.path.join(args.work, "results"),
        epochs=args.epochs, batch_size=8, patch_size=32, patch_shift=16,
        tr_steps=30, v_steps=8, lr_schedule_steps=100000,
        pipeline="device", seed=0)   # clip_patches stays the default (0)
    assert cfg.clip_patches == 0
    # Record what the adaptive default actually resolves to on this
    # corpus (fold-0 training split).
    from sm_hpss_mtl_tpu.cli.experiment import (_class_subset,
                                                class_names_for,
                                                load_or_create_folds,
                                                split_train_val)
    from sm_hpss_mtl_tpu.data import get_train_test_files
    cv = load_or_create_folds(cfg)
    tr, _ = get_train_test_files(cv, 0, class_names=class_names_for(3))
    trs, _ = split_train_val(_class_subset(tr, 3), seed=cfg.seed)
    resolved = resolve_clip_patches(cfg, trs)

    outs = run_experiment(cfg, folds=[0, 1, 2], verbose=True, resume=False)
    accs = [o["row"]["accuracy"] for o in outs]
    epochs_run = [o["row"]["epochs_run"] for o in outs]

    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    report["tpu_device_pipeline_defaults_r4"] = {
        "what": "Same protocol as tpu_device_pipeline but running the "
                "round-4 DEFAULTS: clip_patches=0 resolves adaptively "
                "(smallest training class < 8*batch clips -> 1 patch "
                "per clip, max per-step clip diversity).",
        "backend": jax.default_backend(),
        "resolved_clip_patches": resolved,
        "fold_accuracies": [round(a, 4) for a in accs],
        "mean": round(sum(accs) / len(accs), 4),
        "epochs_run": epochs_run,
        "comparison": {"host_pipeline_mean": 0.830,
                       "device_cp2_mean_r3": 0.7193,
                       "device_cp1_mean_r3": 0.797},
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["tpu_device_pipeline_defaults_r4"], indent=1))


if __name__ == "__main__":
    main()
