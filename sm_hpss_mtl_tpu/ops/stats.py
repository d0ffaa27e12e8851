"""Per-patch moment statistics (mean / variance / skewness / kurtosis).

Matches the reference's Cython ``get_data_statistics``
(``/root/reference/lib/cython_impl/tools.pyx:169-212``), which loops over
patches calling scipy ``skew`` / ``kurtosis`` (biased estimators, Fisher
kurtosis).  Here the whole patch batch is one vectorized reduction —
``(N, F, T)`` in, ``(N, F)`` (axis=1, "harmonic"/row stats) or ``(N, T)``
(axis=0, "percussive"/column stats) out — which XLA fuses into a single
pass over the data.

Used by the skewness-vector experiment option
(``/root/reference/Proposed_Work_Results.py:97-113``) and the t-SNE
striation analysis (``draw_tSNE_plots.py``).

Zero-variance slices yield 0 for skewness and -3 (Fisher) for kurtosis
would be undefined; we return 0.0 for both, the behavior of the scipy
versions the reference was developed against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _moments(x: jax.Array, axis: int):
    mean = jnp.mean(x, axis=axis)
    d = x - jnp.expand_dims(mean, axis)
    m2 = jnp.mean(d ** 2, axis=axis)
    m3 = jnp.mean(d ** 3, axis=axis)
    m4 = jnp.mean(d ** 4, axis=axis)
    return mean, m2, m3, m4


@functools.partial(jax.jit, static_argnames=("stat_type", "axis"))
def patch_statistics(FV: jax.Array, *, stat_type: str = "skew",
                     axis: int = 0) -> jax.Array:
    """Statistics over one axis of each ``(F, T)`` patch in ``(N, F, T)``.

    ``axis`` follows the reference convention: 0 = along columns
    (per-time-step, "percussive", output ``(N, T)``); 1 = along rows
    (per-frequency-bin, "harmonic", output ``(N, F)``).
    """
    if axis not in (0, 1):
        raise ValueError("axis must be 0 (columns) or 1 (rows)")
    red_axis = 1 if axis == 0 else 2
    x = FV.astype(jnp.float32)
    if stat_type == "mean":
        return jnp.mean(x, axis=red_axis)
    if stat_type == "variance":
        return jnp.var(x, axis=red_axis)
    mean, m2, m3, m4 = _moments(x, red_axis)
    if stat_type == "skew":
        return jnp.where(m2 > _EPS, m3 / jnp.maximum(m2, _EPS) ** 1.5, 0.0)
    if stat_type == "kurtosis":
        return jnp.where(m2 > _EPS, m4 / jnp.maximum(m2, _EPS) ** 2 - 3.0, 0.0)
    raise ValueError(f"unknown stat_type {stat_type!r}")
