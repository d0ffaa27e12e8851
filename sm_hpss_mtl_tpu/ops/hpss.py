"""Harmonic–percussive source separation (HPSS) in pure jnp.

This is the XLA-compiled reference path for
``librosa.decompose.hpss(S, kernel_size=(l_harm, l_perc))`` as invoked at
``/root/reference/lib/preprocessing.py:408,418,430,440``: a width-``l_harm``
running median across time yields the harmonic envelope, a width-``l_perc``
running median across frequency yields the percussive envelope, and the two
are converted to Wiener soft masks (power=2).

Design notes (TPU):

- The sliding median is expressed as a static stack of shifted slices
  followed by ``jnp.median`` — XLA lowers the sort to an on-chip bitonic
  sort over the window axis with fully static shapes.  Boundary handling is
  'symmetric' padding (scipy.ndimage's ``mode='reflect'``).
- Everything is elementwise/sort work on (F, T) planes → vmappable over a
  batch of spectrograms and shardable along T (see
  ``sm_hpss_mtl_tpu.parallel.halo`` for the multi-chip halo-exchange
  version).
- The fused single-pass Pallas kernel lives in
  ``sm_hpss_mtl_tpu.ops.hpss_pallas``; this module is its correctness
  oracle on device and the fallback on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_F32_TINY = float(np.finfo(np.float32).tiny)


def _sliding_median(S: jax.Array, width: int, axis: int) -> jax.Array:
    """Running median of odd ``width`` along ``axis`` with symmetric
    (edge-inclusive reflect) boundary, matching scipy.ndimage
    ``median_filter(..., mode='reflect')``."""
    half = width // 2
    pad = [(0, 0)] * S.ndim
    pad[axis] = (half, half)
    Sp = jnp.pad(S, pad, mode="symmetric")
    windows = jnp.stack(
        [jax.lax.slice_in_dim(Sp, k, k + S.shape[axis], axis=axis)
         for k in range(width)], axis=0)
    return jnp.median(windows, axis=0)


def softmask(X: jax.Array, X_ref: jax.Array, power: float = 2.0) -> jax.Array:
    """Wiener soft mask matching ``librosa.util.softmask`` with
    ``split_zeros=False`` (both-zero positions get mask 0)."""
    X = X.astype(jnp.float32)
    X_ref = X_ref.astype(jnp.float32)
    Z = jnp.maximum(X, X_ref)
    bad = Z < _F32_TINY
    Zs = jnp.where(bad, 1.0, Z)
    m = (X / Zs) ** power
    r = (X_ref / Zs) ** power
    denom = jnp.where(bad, 1.0, m + r)
    return jnp.where(bad, 0.0, m / denom)


@functools.partial(jax.jit, static_argnames=("l_harm", "l_perc", "power"))
def hpss_masks(S: jax.Array, *, l_harm: int = 21, l_perc: int = 11,
               power: float = 2.0) -> tuple[jax.Array, jax.Array]:
    """Harmonic and percussive soft masks for spectrogram(s) ``(..., F, T)``."""
    harm = _sliding_median(S, l_harm, axis=S.ndim - 1)
    perc = _sliding_median(S, l_perc, axis=S.ndim - 2)
    return softmask(harm, perc, power), softmask(perc, harm, power)


@functools.partial(jax.jit, static_argnames=("l_harm", "l_perc", "power"))
def hpss(S: jax.Array, *, l_harm: int = 21, l_perc: int = 11,
         power: float = 2.0) -> tuple[jax.Array, jax.Array]:
    """Split ``(..., F, T)`` magnitude spectrogram(s) into harmonic and
    percussive components ``(H, P) = (S*mask_h, S*mask_p)``."""
    mh, mp = hpss_masks(S, l_harm=l_harm, l_perc=l_perc, power=power)
    S = S.astype(jnp.float32)
    return S * mh, S * mp
