"""Data-layer tests: toy corpus, folds, featurizer cache, balanced batcher."""

import os

import numpy as np
import pytest

from sm_hpss_mtl_tpu.data import (BalancedBatcher, BatcherConfig,
                                  FeatureConfig, Featurizer, create_cv_folds,
                                  get_train_test_files, load_cv_folds,
                                  make_toy_musan, save_cv_folds)
from sm_hpss_mtl_tpu.data.audio import load_and_preprocess_signal, read_wav
from sm_hpss_mtl_tpu.data.prefetch import DevicePrefetcher

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy_musan")
    return make_toy_musan(str(root), n_per_class=9, duration_s=2.0)


@pytest.fixture(scope="module")
def cv(toy_root):
    return create_cv_folds(toy_root, cv=3, seed=0)


def test_toy_corpus_layout(toy_root):
    assert sorted(os.listdir(os.path.join(toy_root, "music")))[0].endswith(".wav")
    x, sr = read_wav(os.path.join(toy_root, "speech",
                                  sorted(os.listdir(os.path.join(toy_root, "speech")))[0]))
    assert sr == 16000 and len(x) == 32000
    assert np.isclose(np.abs(x).max(), 1.0, atol=0.01)


def test_load_and_preprocess(toy_root):
    p = os.path.join(toy_root, "music", "music-toy-0000.wav")
    x, fs = load_and_preprocess_signal(p)
    assert fs == 16000 and len(x) >= 1600
    assert np.isclose(np.abs(x).max(), 1.0, atol=1e-5)
    assert np.isclose(np.mean(x), 0.0, atol=0.05)


def test_cv_folds_structure(cv):
    assert cv["CV_folds"] == 3
    all_music = sum((cv["music"][f"fold{k}"] for k in range(3)), [])
    assert sorted(all_music) == sorted(set(all_music))  # no duplicates
    assert len(all_music) == 9
    # Pair class: each fold has max(len(sp), len(mu)) pairs with cycling SMR
    for k in range(3):
        pairs = cv["speech+music"][f"fold{k}"]
        assert len(pairs) == max(len(cv["speech"][f"fold{k}"]),
                                 len(cv["music"][f"fold{k}"]))
        for p in pairs:
            assert set(p) == {"speech", "music", "SMR"}
            assert -5 <= p["SMR"] <= 20
    assert cv["total_duration"]["speech+music"] == max(
        cv["total_duration"]["music"], cv["total_duration"]["speech"])


def test_cv_folds_stratified(toy_root):
    # Genres cycle through folds round-robin: each genre's files spread out.
    cv = create_cv_folds(toy_root, cv=3, seed=1)
    fold_of = {}
    for k in range(3):
        for f in cv["music"][f"fold{k}"]:
            fold_of[f] = k
    # 9 music files, 3 genres x 3 files; each genre's files must land in
    # distinct folds (round robin within stratum).
    import csv
    ann = {}
    with open(os.path.join(toy_root, "annotations", "music.csv")) as fh:
        for row in csv.reader(fh):
            ann[row[0] + ".wav"] = row[1]
    genre_folds = {}
    for f, k in fold_of.items():
        genre_folds.setdefault(ann[f], []).append(k)
    for g, folds in genre_folds.items():
        assert len(set(folds)) == len(folds), (g, folds)


def test_fold_roundtrip(cv, tmp_path):
    save_cv_folds(cv, str(tmp_path))
    loaded = load_cv_folds(str(tmp_path))
    assert loaded["music"] == cv["music"]
    assert os.path.exists(tmp_path / "fold0.csv")
    train, test = get_train_test_files(loaded, fold=0)
    assert set(train) == {"music", "speech", "speech+music"}
    assert not (set(train["music"]) & set(test["music"]))
    assert len(train["music"]) + len(test["music"]) == 9


def test_featurizer_cache(toy_root, tmp_path):
    cfg = FeatureConfig(feat_name="LogMelSpec", n_mels=24)
    fz = Featurizer(cfg, cache_dir=str(tmp_path))
    p = os.path.join(toy_root, "speech", "speech-toy-0001.wav")
    fv1 = fz.featuregram("speech", sp_path=p)
    assert fv1.shape[0] == 24
    cache_file = tmp_path / "speech" / "speech-toy-0001.npy"
    assert cache_file.exists()
    fv2 = fz.featuregram("speech", sp_path=p)
    np.testing.assert_array_equal(fv1, fv2)


def test_featurizer_mixture_naming(toy_root, tmp_path):
    cfg = FeatureConfig(feat_name="LogMelSpec", n_mels=24)
    fz = Featurizer(cfg, cache_dir=str(tmp_path))
    sp = os.path.join(toy_root, "speech", "speech-toy-0000.wav")
    mu = os.path.join(toy_root, "music", "music-toy-0000.wav")
    fv = fz.featuregram("speech_music", sp, mu, 5)
    assert (tmp_path / "speech_music" /
            "speech-toy-0000_music-toy-0000_5dB.npy").exists()
    assert np.isfinite(fv).all()


@pytest.fixture(scope="module")
def batcher(toy_root, cv, tmp_path_factory):
    cache = tmp_path_factory.mktemp("feat_cache")
    cfg = FeatureConfig(feat_name="LogMelHarmPercSpec", n_mels=20)
    fz = Featurizer(cfg, cache_dir=str(cache))
    train, _ = get_train_test_files(cv, fold=0)
    bcfg = BatcherConfig(batch_size=3, patch_size=32, patch_shift=32,
                         feat_name=cfg.feat_name, input_kind="time_mel",
                         augment_noise=False)
    return BalancedBatcher(fz, toy_root, train, bcfg)


def test_batcher_shapes_and_labels(batcher):
    x, labels = next(batcher)
    bs = 3
    assert x.shape == (3 * bs, 32, 40)  # (N, T, D=2*20)
    assert labels["3C"].shape == (9, 3)
    np.testing.assert_array_equal(labels["S"], [0, 0, 0, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(labels["M"], [1, 1, 1, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(labels["R"][:3], np.tile([1, 0], (3, 1)))
    np.testing.assert_array_equal(labels["R"][3:6], np.tile([0, 1], (3, 1)))
    # Mixture R rows follow the SMR encoding: one component is 1, the other
    # 10^(-|dB|/10).
    mix = labels["R"][6:]
    assert np.all(mix.max(axis=1) == 1.0)
    assert np.all(mix.min(axis=1) <= 1.0)


def test_batcher_carries_leftovers(batcher):
    # Multiple consecutive batches keep class balance and finite values.
    for _ in range(3):
        x, labels = next(batcher)
        assert x.shape[0] == 9
        assert np.isfinite(x).all()


def test_batcher_image_kind(toy_root, cv, tmp_path):
    cfg = FeatureConfig(feat_name="LogMelSpec", n_mels=20)
    fz = Featurizer(cfg, cache_dir=str(tmp_path))
    train, _ = get_train_test_files(cv, fold=0)
    bcfg = BatcherConfig(batch_size=2, patch_size=16, patch_shift=16,
                         feat_name=cfg.feat_name, input_kind="image",
                         augment_noise=True)
    b = BalancedBatcher(fz, toy_root, train, bcfg)
    x, labels = next(b)
    assert x.shape == (6, 20, 16, 1)


def test_prefetcher(batcher):
    pf = DevicePrefetcher(batcher, buffer_size=2, max_batches=3)
    batches = list(pf)
    assert len(batches) == 3
    x, labels = batches[0]
    assert x.shape[0] == 9


def test_balance_data_fallback(rng):
    from sm_hpss_mtl_tpu.data import balance_data
    x = rng.standard_normal((30, 4))
    y = np.array([0] * 20 + [1] * 10)
    xb, yb = balance_data(x, y, seed=0)
    u, c = np.unique(yb, return_counts=True)
    assert c[0] == c[1] == 20
    assert xb.shape[0] == 40


def test_batcher_patch_cache(toy_root, cv, tmp_path):
    cfg = FeatureConfig(feat_name="LogMelSpec", n_mels=20)
    fz = Featurizer(cfg, cache_dir=str(tmp_path / "c1"))
    train, _ = get_train_test_files(cv, fold=0)
    bcfg = BatcherConfig(batch_size=2, patch_size=16, patch_shift=16,
                         feat_name=cfg.feat_name, input_kind="time_mel",
                         augment_noise=False, seed=3)
    b = BalancedBatcher(fz, toy_root, train, bcfg)
    for _ in range(6):
        next(b)
    # Every revisit hits the cache: entries stay bounded by the corpus,
    # and a cached-path batch matches a cold-path batch bit for bit.
    n_entries = len(b._patch_cache)
    assert 0 < n_entries <= len(train["music"]) + len(train["speech"]) + \
        len(train["speech+music"])
    assert b._patch_bytes <= b._patch_limit
    calls = {"n": 0}
    orig = b._patches_for_uncached
    b._patches_for_uncached = lambda *a: (calls.__setitem__("n", calls["n"] + 1)
                                          or orig(*a))
    x_warm, _ = next(b)
    fz2 = Featurizer(cfg, cache_dir=str(tmp_path / "c2"))
    b2 = BalancedBatcher(fz2, toy_root, train,
                         BatcherConfig(batch_size=2, patch_size=16,
                                       patch_shift=16,
                                       feat_name=cfg.feat_name,
                                       input_kind="time_mel",
                                       augment_noise=False, seed=3,
                                       patch_cache_mb=0))
    for _ in range(6):
        next(b2)
    x_cold, _ = next(b2)
    np.testing.assert_array_equal(x_warm, x_cold)


def test_batcher_noise_fallback_matches_native_stats(toy_root, cv, tmp_path):
    from sm_hpss_mtl_tpu import native as native_mod
    cfg = FeatureConfig(feat_name="LogMelSpec", n_mels=20)
    fz = Featurizer(cfg, cache_dir=str(tmp_path))
    train, _ = get_train_test_files(cv, fold=0)
    bcfg = BatcherConfig(batch_size=2, patch_size=16, patch_shift=16,
                         feat_name=cfg.feat_name, input_kind="time_mel",
                         augment_noise=True, seed=11)
    b = BalancedBatcher(fz, toy_root, train, bcfg)
    x_noisy, _ = next(b)
    b_clean = BalancedBatcher(
        fz, toy_root, train,
        BatcherConfig(batch_size=2, patch_size=16, patch_shift=16,
                      feat_name=cfg.feat_name, input_kind="time_mel",
                      augment_noise=False, seed=11))
    x_clean, _ = next(b_clean)
    resid = (x_noisy - x_clean).ravel()
    # The additive field is zero-mean Gaussian at one of the reference's
    # scales {5e-3, 1e-3, 5e-4, 1e-4}.
    assert abs(float(resid.mean())) < 5e-4
    assert any(abs(float(resid.std()) - s) / s < 0.1
               for s in (5e-3, 1e-3, 5e-4, 1e-4)), float(resid.std())
    assert native_mod.available()  # the native path was exercised above
