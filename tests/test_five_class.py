"""5-class pipeline tests: folds with noise, batcher labels, end-to-end."""

import os

import numpy as np
import pytest

from sm_hpss_mtl_tpu.data import (BalancedBatcher, BatcherConfig,
                                  FeatureConfig, Featurizer, create_cv_folds,
                                  get_train_test_files, make_toy_musan)
from sm_hpss_mtl_tpu.train import ExperimentConfig
from sm_hpss_mtl_tpu.cli.experiment import run_experiment


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy_5c")
    return make_toy_musan(str(root), n_per_class=9, duration_s=2.0,
                          with_noise=True)


def test_folds_with_noise(toy_root):
    cv = create_cv_folds(toy_root, cv=3, with_noise=True, seed=0)
    assert "noise" in cv and "speech+noise" in cv
    for k in range(3):
        for p in cv["speech+noise"][f"fold{k}"]:
            assert set(p) == {"speech", "noise", "SMR"}
    assert cv["total_duration"]["speech+noise"] > 0


def test_batcher_5class_labels(toy_root, tmp_path):
    cv = create_cv_folds(toy_root, cv=3, with_noise=True, seed=0)
    train, _ = get_train_test_files(
        cv, 0, class_names=["music", "speech", "speech+music", "noise",
                            "speech+noise"])
    cfg = FeatureConfig(feat_name="LogMelSpec", n_mels=16)
    fz = Featurizer(cfg, cache_dir=str(tmp_path))
    bcfg = BatcherConfig(batch_size=2, patch_size=16, patch_shift=16,
                         feat_name=cfg.feat_name, augment_noise=False)
    b = BalancedBatcher(fz, toy_root, train, bcfg)
    x, labels = next(b)
    bs = 2
    assert x.shape[0] == 5 * bs
    assert set(labels) == {"S", "M", "N", "R", "3C"}
    assert labels["3C"].shape == (10, 5)
    # 5-class driver quirks: speech+music has S=1 AND M=1.
    np.testing.assert_array_equal(labels["S"], [0, 0, 1, 1, 1, 1, 0, 0, 1, 1])
    np.testing.assert_array_equal(labels["M"], [1, 1, 0, 0, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(labels["N"], [0, 0, 0, 0, 0, 0, 1, 1, 1, 1])
    assert labels["R"].shape == (10, 3)
    np.testing.assert_array_equal(labels["R"][0], [1, 0, 0])   # music
    np.testing.assert_array_equal(labels["R"][6], [0, 0, 1])   # noise
    # speech+noise rows have music component 0.
    np.testing.assert_array_equal(labels["R"][8:, 0], [0, 0])


def test_five_class_end_to_end(toy_root, tmp_path):
    cfg = ExperimentConfig(
        model="Lemaire_et_al_MTL_5class", data_root=toy_root,
        feature_dir=str(tmp_path / "features"),
        output_dir=str(tmp_path / "results"), n_classes=5,
        epochs=1, batch_size=2, patch_size=16, patch_shift=16,
        tr_steps=2, v_steps=1, augment_noise=False)
    results = run_experiment(cfg, folds=[0], verbose=False)
    row = results[0]["row"]
    assert np.isfinite(row["val_loss"])
    assert "F1_spno" in row
    conf = results[0]["test"]["ConfMat"]
    assert conf.shape == (5, 5)
