"""Optax optimizers matching the reference's per-model compile settings.

======================  ====================================================
Model                   Reference setting (file:line)
======================  ====================================================
Lemaire* (all)          SGD momentum 0.9, clipnorm=1, ExponentialDecay
                        (0.002, 3*TR_STEPS, 0.1)
                        (lib/proposed_architectures.py:156-158)
Doukhan*                Adam 1e-4 (lib/proposed_architectures.py:500-501)
Papakostas*             SGD, ExponentialDecay(0.001, 700, 0.1)
                        (lib/proposed_architectures.py:576-578)
Jang*                   Adam 1e-3 (lib/proposed_architectures.py:753-754)
======================  ====================================================

Keras ``clipnorm`` clips each gradient *tensor* to L2 norm 1 before the
momentum update — that is :func:`clip_by_per_tensor_norm`, not optax's
global-norm clip.  Keras ``ExponentialDecay(staircase=False)`` is
``lr(step) = init * rate^(step / decay_steps)`` = optax
``exponential_decay``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_by_per_tensor_norm(max_norm: float) -> optax.GradientTransformation:
    """Keras-style clipnorm: rescale each gradient leaf to at most
    ``max_norm`` L2 norm."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return (g * scale).astype(g.dtype)

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def exponential_decay(init_value: float, decay_steps: int,
                      decay_rate: float = 0.1) -> optax.Schedule:
    return optax.exponential_decay(init_value=init_value,
                                   transition_steps=decay_steps,
                                   decay_rate=decay_rate, staircase=False)


def keras_sgd(schedule, momentum: float = 0.9) -> optax.GradientTransformation:
    """Keras-semantics SGD with momentum under a decaying lr:
    ``v_t = m*v_{t-1} - lr_t*g_t; p += v_t`` — the lr scales each
    gradient BEFORE it enters the velocity (optax.sgd scales the
    accumulated velocity instead, which diverges under decay)."""
    return optax.chain(
        optax.scale_by_learning_rate(schedule, flip_sign=False),
        optax.trace(decay=momentum),
        optax.scale(-1.0),
    )


def lemaire_optimizer(tr_steps: int, init_lr: float = 0.002):
    sched = exponential_decay(init_lr, 3 * tr_steps)
    return optax.chain(clip_by_per_tensor_norm(1.0),
                       keras_sgd(sched, momentum=0.9)), sched


def papakostas_optimizer(init_lr: float = 0.001):
    sched = exponential_decay(init_lr, 700)
    return optax.sgd(sched), sched


def doukhan_optimizer(lr: float = 1e-4):
    # Keras Adam defaults: eps=1e-7 (optax defaults to 1e-8).
    return optax.adam(lr, eps=1e-7), lambda step: lr


def jang_optimizer(lr: float = 1e-3):
    return optax.adam(lr, eps=1e-7), lambda step: lr


def for_model(name: str, tr_steps: int):
    """Optimizer + LR schedule for a registry model name."""
    if name.startswith("Lemaire"):
        return lemaire_optimizer(tr_steps)
    if name.startswith("Doukhan"):
        return doukhan_optimizer()
    if name.startswith("Papakostas"):
        return papakostas_optimizer()
    if name.startswith("Jang"):
        return jang_optimizer()
    raise ValueError(f"unknown model {name!r}")
