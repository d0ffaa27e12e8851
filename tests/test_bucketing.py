"""Length-bucketed featurization: compile-count control with bounded
boundary deviation."""

import numpy as np
import pytest

from sm_hpss_mtl_tpu.data.featurize import (FeatureConfig, Featurizer,
                                            _reflect_pad_to, bucket_length)


def test_bucket_length_grid():
    assert bucket_length(16000) == 16000
    assert bucket_length(16001) > 16001
    # grid is shared: nearby lengths map to the same bucket
    assert bucket_length(17000) == bucket_length(17500)
    # ~50 distinct buckets from 1 s to 3 h
    lens = {bucket_length(n) for n in range(16000, 16000 * 3600 * 3, 160000)}
    assert len(lens) < 80


def test_reflect_pad():
    x = np.arange(5, dtype=np.float32)
    out = _reflect_pad_to(x, 12)
    assert len(out) == 12
    np.testing.assert_array_equal(out[:5], x)
    np.testing.assert_array_equal(out[5:10], x[::-1])
    assert np.isfinite(out).all()
    # pad longer than several signal lengths works
    assert len(_reflect_pad_to(x, 23)) == 23


@pytest.mark.parametrize("feat_name", ["LogMelSpec", "LogMelHarmPercSpec"])
def test_bucketed_matches_exact_interior(rng, feat_name):
    """Bucketed features must be identical to the exact computation on
    all frames except the last l_harm//2 (harmonic-median halo)."""
    fs = 16000
    n = int(1.37 * fs)  # deliberately off-grid length
    x = (0.2 * rng.standard_normal(n)).astype(np.float32)
    x += np.sin(2 * np.pi * 440 * np.arange(n) / fs).astype(np.float32)

    cfg = FeatureConfig(feat_name=feat_name, n_mels=24)
    exact = Featurizer(cfg, bucket=False)
    bucketed = Featurizer(cfg, bucket=True)
    fv_e = exact._compute(x)
    fv_b = bucketed._compute(x)
    assert fv_e.shape == fv_b.shape
    halo = cfg.l_harm // 2 if "Harm" in feat_name or "Perc" in feat_name else 0
    T = fv_e.shape[1]
    np.testing.assert_allclose(fv_b[:, :T - halo], fv_e[:, :T - halo],
                               rtol=1e-4, atol=1e-3)
    # Even the halo frames stay close (reflected context).
    assert np.max(np.abs(fv_b - fv_e)) < 20.0  # dB scale sanity


def test_precompute_matches_per_file(rng, tmp_path):
    """Bulk precompute must produce byte-identical cache entries to the
    per-file path."""
    from sm_hpss_mtl_tpu.data import make_toy_musan
    import os
    root = make_toy_musan(str(tmp_path / "corpus"), n_per_class=4,
                          duration_s=1.5)
    cfg = FeatureConfig(feat_name="LogMelHarmPercSpec", n_mels=16)
    items = [("music", "", os.path.join(root, "music", f), None)
             for f in sorted(os.listdir(os.path.join(root, "music")))]
    items += [("speech_music", os.path.join(root, "speech",
                                            "speech-toy-0000.wav"),
               os.path.join(root, "music", "music-toy-0001.wav"), 5)]

    fz_bulk = Featurizer(cfg, cache_dir=str(tmp_path / "bulk"))
    done = fz_bulk.precompute(items, batch_size=3)
    assert done == len(items)
    # second call: everything cached
    assert fz_bulk.precompute(items) == 0

    fz_single = Featurizer(cfg, cache_dir=str(tmp_path / "single"))
    for cls, sp, mu, db in items:
        fv1 = fz_single.featuregram(cls, sp, mu, db)
        name_cls = cls
        from sm_hpss_mtl_tpu.data.featurize import mixture_cache_name
        name = mixture_cache_name(sp, mu, db)
        fv2 = np.load(tmp_path / "bulk" / name_cls / (name + ".npy"))
        np.testing.assert_allclose(fv2, fv1, atol=1e-5, rtol=1e-5)
