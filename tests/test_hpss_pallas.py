"""Pallas HPSS kernel tests.

On the CPU test backend the kernel runs in interpreter mode (small
shapes); the selection networks are validated exhaustively against
``np.median``.  Full-speed parity on real TPU is exercised by bench.py
and the verify flow.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sm_hpss_mtl_tpu.ops import hpss_pallas as hp
from sm_hpss_mtl_tpu.ops import reference as ref

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("n", [3, 5, 7, 11, 15, 21, 31])
def test_median_network_matches_np_median(rng, n):
    pairs = hp.median_network(n)
    assert len(pairs) <= len(hp.batcher_pairs(n))
    x = rng.standard_normal((5000, n))
    v = [x[:, i].copy() for i in range(n)]
    for i, j in pairs:
        lo = np.minimum(v[i], v[j])
        hi = np.maximum(v[i], v[j])
        v[i], v[j] = lo, hi
    np.testing.assert_allclose(v[n // 2], np.median(x, axis=1))


def test_kernel_interpret_parity_small(rng):
    S = np.abs(rng.standard_normal((2, 31, 70))).astype(np.float32)
    H, P = hp.hpss(jnp.asarray(S), l_harm=7, l_perc=5, interpret=True, tile_t=32)
    for b in range(2):
        gH, gP = ref.hpss(S[b], 7, 5)
        np.testing.assert_allclose(np.asarray(H)[b], gH, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(P)[b], gP, rtol=1e-5, atol=1e-6)


def test_kernel_interpret_masks_and_tiling(rng):
    # T spans multiple tiles and isn't a tile multiple -> exercises halo'd
    # tile gather + edge padding + output reassembly.
    S = np.abs(rng.standard_normal((1, 17, 150))).astype(np.float32)
    mh, mp = hp.hpss_masks(jnp.asarray(S), l_harm=21, l_perc=11,
                           interpret=True, tile_t=48)
    gh, gp = ref.hpss_masks(S[0], 21, 11)
    rel_h = np.abs(np.asarray(mh)[0] - gh) / (np.abs(gh) + 1e-3)
    rel_p = np.abs(np.asarray(mp)[0] - gp) / (np.abs(gp) + 1e-3)
    assert rel_h.max() < 1e-3
    assert rel_p.max() < 1e-3


def test_dispatch_shapes(rng):
    S2 = np.abs(rng.standard_normal((9, 40))).astype(np.float32)
    H, P = hp.hpss(jnp.asarray(S2), l_harm=5, l_perc=3, interpret=True, tile_t=32)
    assert H.shape == S2.shape and P.shape == S2.shape
    S4 = np.abs(rng.standard_normal((2, 3, 9, 40))).astype(np.float32)
    H4, P4 = hp.hpss(jnp.asarray(S4), l_harm=5, l_perc=3, interpret=True, tile_t=32)
    assert H4.shape == S4.shape
    # 4-D result matches the 2-D result item-wise.
    H0, _ = hp.hpss(jnp.asarray(S4[1, 2]), l_harm=5, l_perc=3,
                    interpret=True, tile_t=32)
    np.testing.assert_allclose(np.asarray(H4)[1, 2], np.asarray(H0), atol=1e-6)


def test_cpu_fallback_matches_oracle(rng):
    # Without interpret on a CPU backend the public API falls back to the
    # jnp path; results must still match the golden.
    S = np.abs(rng.standard_normal((13, 60))).astype(np.float32)
    H, P = hp.hpss(jnp.asarray(S), l_harm=7, l_perc=5)
    gH, gP = ref.hpss(S, 7, 5)
    np.testing.assert_allclose(np.asarray(H), gH, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(P), gP, rtol=1e-5, atol=1e-6)
