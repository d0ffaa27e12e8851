"""Hyperparameter tuning drivers.

Two modes, covering three reference scripts:

- ``--mode grid``: sweep ONE hyperparameter over the reference's ranges
  (``/root/reference/Hyperparameter_Selection.py:541-552``): n_mels
  [20..120], l_harm/l_perc [11..51], W [25..100], loss_weights presets —
  one short training per value on fold 0.
- ``--mode search``: search over the TCN architecture space
  (``B3_architecture_tuning.py:251-259``: kernel_size 3..19 odd, Nd 3..8,
  nb_stacks 3..10, n_layers folded into stacks, n_filters {8,16,32},
  skip connections) or over the MTL head shapes
  (``B3_MTL_architecture_tuning.py:326-334``: per-head layers 1..3,
  widths {16,32,64,128}) with ``--space {arch,mtl-heads}``.  Both of the
  reference tuner's algorithms (``B3_architecture_tuning.py:251-289``)
  are available via ``--algo {random,bayes}``; bayes is GP expected
  improvement (``utils/bayesopt.py``), seeded and deterministic.

Results go to a tab-separated Tuning.csv; the best setting is printed.

    python -m sm_hpss_mtl_tpu.cli.tune --data corpus --mode grid --param l_harm
    python -m sm_hpss_mtl_tpu.cli.tune --data corpus --mode search \\
        --space arch --trials 20
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

from ..train import ExperimentConfig
from ..utils.results import append_results
from .experiment import run_experiment

GRID_RANGES = {
    "n_mels": [20, 40, 60, 80, 100, 120],
    "l_harm": [11, 21, 31, 41, 51],
    "l_perc": [11, 21, 31, 41, 51],
    "W": [25, 50, 75, 100],
    "loss_weights": [
        {"3C": 0.4, "R": 0.2, "M": 0.2, "S": 0.2},
        {"3C": 0.2, "R": 0.4, "M": 0.2, "S": 0.2},
        {"3C": 0.2, "R": 0.2, "M": 0.4, "S": 0.2},
        {"3C": 0.2, "R": 0.2, "M": 0.2, "S": 0.4},
    ],
}


def _apply_grid_value(cfg: ExperimentConfig, param: str, value):
    if param == "n_mels":
        return dataclasses.replace(cfg, n_mels_override=int(value))
    if param == "l_harm":
        return dataclasses.replace(cfg, l_harm=int(value))
    if param == "l_perc":
        return dataclasses.replace(cfg, l_perc=int(value))
    if param == "W":
        v = int(value)
        return dataclasses.replace(cfg, patch_size=v, patch_shift=v,
                                   test_patch_shift=v)
    if param == "loss_weights":
        return dataclasses.replace(cfg, loss_weights=value)
    raise ValueError(param)


def search_space(space: str) -> dict:
    from ..utils.bayesopt import ARCH_SPACE, MTL_HEADS_SPACE
    if space == "arch":
        return ARCH_SPACE
    if space == "mtl-heads":
        return MTL_HEADS_SPACE
    raise ValueError(space)


def sample_arch(rng: np.random.Generator, space: str) -> dict:
    return {k: (v[rng.integers(len(v))])
            for k, v in search_space(space).items()}


def _score(cfg: ExperimentConfig, fold: int, tag: str) -> dict:
    # Per-trial output dir: trials must not share (or resume from) each
    # other's checkpoints — their architectures differ.
    cfg = dataclasses.replace(
        cfg, output_dir=os.path.join(cfg.output_dir, tag))
    out = run_experiment(cfg, folds=[fold], verbose=False, resume=False)[0]
    return {"val_loss": out["row"]["val_loss"],
            "accuracy": out["row"]["accuracy"]}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--model", default="Lemaire_et_al_MTL")
    p.add_argument("--features", default="")
    p.add_argument("--output", default="./results/tuning")
    p.add_argument("--mode", choices=["grid", "search"], default="grid")
    p.add_argument("--param", choices=list(GRID_RANGES), default="l_harm")
    p.add_argument("--space", choices=["arch", "mtl-heads"], default="arch")
    p.add_argument("--algo", choices=["random", "bayes"], default="random")
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--patch-size", type=int, default=68)
    p.add_argument("--tr-steps", type=int, default=0)
    p.add_argument("--v-steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    base = ExperimentConfig(
        model=args.model, data_root=args.data, feature_dir=args.features,
        output_dir=args.output, epochs=args.epochs,
        batch_size=args.batch_size, patch_size=args.patch_size,
        patch_shift=args.patch_size, tr_steps=args.tr_steps,
        v_steps=args.v_steps, seed=args.seed)

    rows = []
    if args.mode == "grid":
        for value in GRID_RANGES[args.param]:
            cfg = _apply_grid_value(base, args.param, value)
            score = _score(cfg, args.fold, f"{args.param}_{value if not isinstance(value, dict) else max(value, key=value.get)}")
            row = {args.param: str(value), **score}
            rows.append(row)
            append_results(args.output, args.fold, row, suffix="Tuning")
            print(row, flush=True)
        best = min(rows, key=lambda r: r["val_loss"])
    else:
        rng = np.random.default_rng(args.seed)
        opt = None
        if args.algo == "bayes":
            from ..utils.bayesopt import BayesOptimizer
            opt = BayesOptimizer(search_space(args.space), seed=args.seed,
                                 n_init=min(5, max(args.trials // 4, 2)))
        for t in range(args.trials):
            arch = opt.ask() if opt else sample_arch(rng, args.space)
            cfg = dataclasses.replace(base, arch_kwargs=arch)
            score = _score(cfg, args.fold, f"trial{t}")
            if opt:
                opt.tell(arch, score["val_loss"])
            row = {"trial": t, **arch, **score}
            rows.append(row)
            append_results(args.output, args.fold, row, suffix="Tuning")
            print(row, flush=True)
        best = min(rows, key=lambda r: r["val_loss"])
    print("best:", best)
    return rows, best


if __name__ == "__main__":
    main()
