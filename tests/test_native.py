"""Native C++ kernels vs their numpy twins."""

import numpy as np
import pytest

from sm_hpss_mtl_tpu import native
from sm_hpss_mtl_tpu.ops import reference as ref
from sm_hpss_mtl_tpu.ops import silence as py_silence
from sm_hpss_mtl_tpu.ops.patches import extract_patches_np, standardize_rows
from sm_hpss_mtl_tpu.data.batcher import scale_frames

pytestmark = [pytest.mark.quick,
              pytest.mark.skipif(not native.available(),
                                 reason=f"native build failed: "
                                        f"{native.build_error()}")]


@pytest.mark.parametrize("T,W,shift", [(500, 68, 68), (40, 68, 68),
                                       (300, 249, 24)])
def test_extract_patches(rng, T, W, shift):
    fv = rng.standard_normal((12, T)).astype(np.float32)
    want = extract_patches_np(fv, W, shift)
    got = native.extract_patches(fv, W, shift)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_standardize_rows(rng):
    fv = rng.standard_normal((8, 123)).astype(np.float32)
    fv[3] = 2.5
    want = np.asarray(standardize_rows(fv.astype(np.float64)))
    got = native.standardize_rows(fv)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_scale_frames(rng):
    fv = rng.standard_normal((6, 50)).astype(np.float32)
    mean = rng.standard_normal(6).astype(np.float32)
    stdev = np.abs(rng.standard_normal(6)).astype(np.float32)
    want = scale_frames(fv, mean, stdev)
    got = native.scale_frames(fv, mean, stdev)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_remove_silence_matches_python(rng):
    fs = 16000
    x = 0.5 * rng.standard_normal(3 * fs).astype(np.float32)
    x[fs // 2:fs] = 1e-5
    x[2 * fs:2 * fs + fs // 2] = 1e-5
    e = ref.rms_energy(x, 400, 160)
    want = py_silence.remove_silence(x, e, fs)
    got = native.remove_silence(x, e, fs)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(got[2], want[2])
    assert abs(got[3] - want[3]) < 1e-9


@pytest.mark.parametrize("stat,axis", [("mean", 0), ("variance", 1),
                                       ("skew", 0), ("kurtosis", 1)])
def test_patch_statistics(rng, stat, axis):
    import scipy.stats
    fv = rng.standard_normal((4, 10, 20))
    got = native.patch_statistics(fv, stat, axis)
    fns = {"mean": np.mean, "variance": np.var,
           "skew": scipy.stats.skew, "kurtosis": scipy.stats.kurtosis}
    want = np.stack([fns[stat](fv[i], axis=axis) for i in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_native_large_featuregram(rng):
    # Shape sanity on a large featuregram.  (No wall-clock assertion:
    # this sandbox's first-touch page faults are pathologically slow, so
    # timing here measures the VM, not the kernel.)
    fv = rng.standard_normal((240, 20000)).astype(np.float32)
    out = native.extract_patches(fv, 68, 8)
    from sm_hpss_mtl_tpu.ops.patches import num_patches
    assert out.shape[0] == num_patches(20000, 68, 8)


def test_add_gaussian_noise_moments():
    x = np.zeros((48, 68, 240), np.float32)
    native.add_gaussian_noise(x, 1.0, seed=42)
    assert abs(float(x.mean())) < 5e-3
    assert abs(float(x.var()) - 1.0) < 5e-3
    z = (x - x.mean()) / x.std()
    assert abs(float((z ** 3).mean())) < 2e-2            # skew
    assert abs(float((z ** 4).mean()) - 3.0) < 5e-2      # kurtosis
    # Tail mass beyond 3 sigma (2*Phi(-3) = 0.0027).
    assert abs(float((np.abs(x) > 3).mean()) - 0.0027) < 5e-4


def test_add_gaussian_noise_deterministic_and_scaled():
    a = np.zeros(10000, np.float32)
    b = np.zeros(10000, np.float32)
    native.add_gaussian_noise(a, 5e-3, seed=7)
    native.add_gaussian_noise(b, 5e-3, seed=7)
    np.testing.assert_array_equal(a, b)
    c = np.zeros(10000, np.float32)
    native.add_gaussian_noise(c, 5e-3, seed=8)
    assert not np.array_equal(a, c)
    assert abs(float(a.std()) - 5e-3) < 5e-4
    # Additive on existing content.
    base = np.ones(10000, np.float32)
    native.add_gaussian_noise(base, 5e-3, seed=7)
    np.testing.assert_allclose(base, 1.0 + a, rtol=0, atol=1e-7)
