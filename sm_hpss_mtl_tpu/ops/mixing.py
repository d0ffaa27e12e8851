"""Signal normalization and SMR-controlled speech+music mixing.

Matches ``normalize_signal`` and ``mix_signals`` in the reference
(``/root/reference/lib/preprocessing.py:114-132,297-325``): music is tiled
to at least speech length, scaled so its energy sits ``target_dB`` below
the speech energy, the gains are normalized to sum to 1, and the mixture is
re-normalized (zero mean, unit peak).

Both host (numpy) and device (jnp, fixed-length, jit/vmap-friendly)
variants are provided; the device variant is used by the batched
on-device augmentation path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize_signal_np(x: np.ndarray) -> np.ndarray:
    x = x - np.mean(x)
    return x / np.max(np.abs(x))


def mix_signals_np(sp: np.ndarray, mu: np.ndarray, target_dB: float) -> np.ndarray:
    """Host-side mixing with the reference's exact tiling rule."""
    mu_t = mu.copy()
    while len(mu_t) < len(sp):
        mu_t = np.append(mu_t, mu)
    n = min(len(sp), len(mu_t))
    sp = sp[:n]
    mu_t = mu_t[:n]

    e_sp = np.sum(sp ** 2) / len(sp)
    e_mu = np.sum(mu_t ** 2) / len(mu_t)
    req_e_mu = e_sp / (10.0 ** (target_dB / 10.0))
    g_mu = np.sqrt(req_e_mu / e_mu)
    g_sp = 1.0
    s = g_mu + g_sp
    mix = (g_sp / s) * sp + (g_mu / s) * mu_t
    return normalize_signal_np(mix)


def normalize_signal(x: jax.Array) -> jax.Array:
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    return x / jnp.max(jnp.abs(x), axis=-1, keepdims=True)


@jax.jit
def mix_signals(sp: jax.Array, mu: jax.Array, target_dB: jax.Array) -> jax.Array:
    """Device-side mixing for equal-length ``(..., n)`` signals.

    Fixed shapes (no tiling) — the host pipeline aligns lengths before
    handing batches to the device.  ``target_dB`` broadcasts over leading
    axes, so a whole batch can be mixed at per-item SMRs in one call.
    """
    target_dB = jnp.asarray(target_dB)[..., None] if jnp.ndim(target_dB) < sp.ndim \
        else jnp.asarray(target_dB)
    e_sp = jnp.mean(sp ** 2, axis=-1, keepdims=True)
    e_mu = jnp.mean(mu ** 2, axis=-1, keepdims=True)
    req_e_mu = e_sp / (10.0 ** (target_dB / 10.0))
    g_mu = jnp.sqrt(req_e_mu / jnp.maximum(e_mu, 1e-30))
    s = g_mu + 1.0
    mix = (1.0 / s) * sp + (g_mu / s) * mu
    return normalize_signal(mix)
