"""Losses matching the reference's Keras compile settings.

``model.compile(loss={'S': 'binary_crossentropy', 'M':
'binary_crossentropy', 'R': 'mean_squared_error', '3C':
'categorical_crossentropy'}, loss_weights=...)``
(``/root/reference/lib/proposed_architectures.py:160-165``): the total
loss is the (optionally weighted) sum of per-head losses, each a batch
mean.  BCE/CCE operate on probabilities with Keras' 1e-7 clipping since
the reference models emit sigmoid/softmax activations.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def binary_crossentropy(p: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean BCE; ``p`` in (0,1) shape (B, 1) or (B,), ``y`` in {0,1}."""
    p = jnp.clip(jnp.squeeze(p, -1) if p.ndim > y.ndim else p, _EPS, 1 - _EPS)
    y = y.astype(p.dtype)
    return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))


def categorical_crossentropy(p: jnp.ndarray, y_onehot: jnp.ndarray) -> jnp.ndarray:
    """Mean CCE over one-hot labels; ``p`` is a softmax output (B, C)."""
    p = jnp.clip(p, _EPS, 1.0)
    return -jnp.mean(jnp.sum(y_onehot * jnp.log(p), axis=-1))


def mean_squared_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def hinge(p: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Keras hinge on a sigmoid output: labels mapped to ±1,
    ``mean(max(0, 1 - y_pm * pred))`` — the alternative binary loss the
    MTL tuning driver searches over
    (``B3_MTL_architecture_tuning.py:333-334``)."""
    p = jnp.squeeze(p, -1) if p.ndim > y.ndim else p
    y_pm = 2.0 * y.astype(p.dtype) - 1.0
    return jnp.mean(jnp.maximum(0.0, 1.0 - y_pm * p))


def mtl_loss(outputs: dict, labels: dict, loss_weights: dict | None = None,
             loss_types: dict | None = None) -> tuple[jnp.ndarray, dict]:
    """Weighted sum of per-head losses.  ``outputs``/``labels`` keyed by
    head name (S, M, [N], R, 3C/NC).  ``loss_types`` may override a
    binary head's loss with 'hinge'.  Returns (total, per-head dict)."""
    loss_types = loss_types or {}
    per_head = {}
    for key, out in outputs.items():
        y = labels[key]
        if key == "R":
            per_head[key] = mean_squared_error(out, y)
        elif key in ("3C", "NC"):
            per_head[key] = categorical_crossentropy(out, y)
        elif loss_types.get(key) == "hinge":
            per_head[key] = hinge(out, y)
        else:  # S, M, N binary heads
            per_head[key] = binary_crossentropy(out, y)
    weights = loss_weights or {}
    total = sum(weights.get(k, 1.0) * v for k, v in per_head.items())
    return total, per_head
