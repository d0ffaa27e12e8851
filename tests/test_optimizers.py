"""Optimizer parity: exact Keras SGD trajectory (clipnorm -> momentum
with per-step lr scaling) and schedule values."""

import numpy as np

import jax.numpy as jnp

from sm_hpss_mtl_tpu.train.optimizers import (exponential_decay,
                                              lemaire_optimizer)


def test_keras_sgd_trajectory():
    opt, sched = lemaire_optimizer(tr_steps=10, init_lr=0.002)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    state = opt.init(p)
    p_ref = np.asarray(p).copy()
    v = np.zeros_like(p_ref)
    pj = p
    for step in range(12):
        g = rng.standard_normal(5).astype(np.float32) * 3
        # Hand-rolled Keras reference: clipnorm=1, then
        # v = 0.9*v - lr_t*g; p += v with lr_t = 0.002 * 0.1^(t/30).
        norm = np.sqrt((g ** 2).sum())
        gc = g * min(1.0, 1.0 / norm)
        lr = 0.002 * 0.1 ** (step / 30)
        v = 0.9 * v - lr * gc
        p_ref = p_ref + v
        upd, state = opt.update(jnp.asarray(g), state, pj)
        pj = pj + upd
        np.testing.assert_allclose(np.asarray(pj), p_ref, rtol=1e-5,
                                   atol=1e-7)


def test_exponential_decay_values():
    sched = exponential_decay(0.002, 30)
    assert np.isclose(float(sched(0)), 0.002)
    assert np.isclose(float(sched(30)), 0.0002, rtol=1e-6)
    assert np.isclose(float(sched(15)), 0.002 * 0.1 ** 0.5, rtol=1e-6)
