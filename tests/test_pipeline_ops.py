"""Tests for the data-pipeline ops: patches, silence, mixing, stats.

Oracles are direct ports of the reference's Cython/py semantics
(``/root/reference/lib/cython_impl/tools.pyx``, ``lib/preprocessing.py``)
written inline here from their documented behavior.
"""

import numpy as np
import pytest
import scipy.stats

import jax.numpy as jnp

from sm_hpss_mtl_tpu.ops import mixing, patches, silence, stats
from sm_hpss_mtl_tpu.ops import reference as ref

pytestmark = pytest.mark.quick


# ---------------------------------------------------------------------------
# Patch extraction
# ---------------------------------------------------------------------------

def _oracle_extract(FV, patch_size, patch_shift):
    """Literal re-statement of tools.pyx:21-38 + preprocessing.py:139-142."""
    FV1 = FV.copy()
    while FV.shape[1] <= patch_size:
        FV = np.append(FV, FV1, axis=1)
    n_frames = FV.shape[1]
    half = patch_size // 2
    out = []
    for i in range(half, n_frames - half, patch_shift):
        s = i - half
        e = min(s + patch_size, n_frames)
        if e - s < patch_size:
            s = e - patch_size
        out.append(FV[:, s:e])
    return np.stack(out)


@pytest.mark.parametrize("T,W,shift", [(500, 68, 68), (500, 68, 1),
                                       (300, 249, 24), (40, 68, 68),
                                       (501, 249, 249)])
def test_extract_patches_matches_oracle(rng, T, W, shift):
    FV = rng.standard_normal((12, T))
    want = _oracle_extract(FV.copy(), W, shift)
    got_np = patches.extract_patches_np(FV, W, shift)
    got_j = np.asarray(patches.extract_patches(jnp.asarray(FV),
                                               patch_size=W, patch_shift=shift))
    assert got_np.shape == want.shape == got_j.shape
    np.testing.assert_allclose(got_np, want)
    np.testing.assert_allclose(got_j, want, rtol=1e-6)
    assert patches.num_patches(T, W, shift) == want.shape[0]


def test_standardize_rows_matches_sklearn(rng):
    from sklearn.preprocessing import StandardScaler
    FV = rng.standard_normal((10, 200)).astype(np.float64)
    FV[3] = 7.0  # constant row
    want = StandardScaler(copy=False).fit_transform(FV.T.copy()).T
    got = np.asarray(patches.standardize_rows(FV))
    np.testing.assert_allclose(got, want, atol=1e-9)


# ---------------------------------------------------------------------------
# Silence removal
# ---------------------------------------------------------------------------

def test_remove_silence_keeps_loud_audio(audio_1s):
    e = ref.rms_energy(audio_1s, 400, 160)
    out, smark, fmark, dur = silence.remove_silence(audio_1s, e, 16000)
    assert len(out) == len(audio_1s)      # no long silences in the fixture
    assert dur == 0.0


def test_remove_silence_cuts_two_gaps(rng):
    fs = 16000
    x = 0.5 * rng.standard_normal(3 * fs).astype(np.float32)
    x[fs // 2:fs] = 1e-5          # 500 ms gap
    x[2 * fs:2 * fs + fs // 2] = 1e-5  # another 500 ms gap
    e = ref.rms_energy(x, 400, 160)
    out, smark, fmark, dur = silence.remove_silence(x, e, fs)
    assert 0.8 < dur < 1.2
    assert len(out) == int(smark.sum())
    assert len(out) < len(x) - int(0.8 * fs)


def test_remove_silence_single_segment_kept(rng):
    # Reference quirk: one qualifying silent segment is NOT removed.
    fs = 16000
    x = 0.5 * rng.standard_normal(2 * fs).astype(np.float32)
    x[fs // 2:fs] = 1e-5
    e = ref.rms_energy(x, 400, 160)
    out, smark, fmark, dur = silence.remove_silence(x, e, fs)
    assert dur > 0.3
    assert len(out) == len(x)


# ---------------------------------------------------------------------------
# Mixing
# ---------------------------------------------------------------------------

def test_mix_signals_energy_ratio(rng):
    fs = 16000
    sp = rng.standard_normal(fs).astype(np.float64)
    mu = 0.3 * rng.standard_normal(fs).astype(np.float64)
    for dB in [-5, 0, 10, 20]:
        mix = mixing.mix_signals_np(sp, mu, dB)
        assert np.isclose(np.mean(mix), 0.0, atol=1e-9)
        assert np.isclose(np.max(np.abs(mix)), 1.0)
        # Pre-normalization component energies obey the target ratio.
        e_sp = np.mean(sp ** 2)
        g_mu = np.sqrt(e_sp / (10 ** (dB / 10)) / np.mean(mu ** 2))
        got_ratio = 10 * np.log10(e_sp / np.mean((g_mu * mu) ** 2))
        assert np.isclose(got_ratio, dB, atol=1e-9)


def test_mix_signals_tiles_short_music(rng):
    sp = rng.standard_normal(1000)
    mu = rng.standard_normal(300)
    mix = mixing.mix_signals_np(sp, mu, 0)
    assert len(mix) == 1000


def test_mix_signals_device_matches_np(rng):
    sp = rng.standard_normal(4000)
    mu = rng.standard_normal(4000)
    want = mixing.mix_signals_np(sp, mu, 5.0)
    got = np.asarray(mixing.mix_signals(jnp.asarray(sp), jnp.asarray(mu), 5.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mix_signals_device_batched_per_item_smr(rng):
    sp = rng.standard_normal((3, 4000))
    mu = rng.standard_normal((3, 4000))
    dbs = np.array([-5.0, 0.0, 15.0])
    got = np.asarray(mixing.mix_signals(jnp.asarray(sp), jnp.asarray(mu),
                                        jnp.asarray(dbs)))
    for i in range(3):
        want = mixing.mix_signals_np(sp[i], mu[i], dbs[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Patch statistics
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stat,axis", [("mean", 0), ("variance", 1),
                                       ("skew", 0), ("skew", 1),
                                       ("kurtosis", 0), ("kurtosis", 1)])
def test_patch_statistics_match_scipy(rng, stat, axis):
    FV = rng.standard_normal((5, 16, 32))
    got = np.asarray(stats.patch_statistics(jnp.asarray(FV),
                                            stat_type=stat, axis=axis))
    fns = {"mean": np.mean, "variance": np.var,
           "skew": scipy.stats.skew, "kurtosis": scipy.stats.kurtosis}
    want = np.stack([fns[stat](FV[i], axis=axis) for i in range(5)])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
