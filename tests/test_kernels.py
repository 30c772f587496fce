"""Pallas kernel tests (interpret mode on CPU): fused kernels must match the
XLA reference path in forward and gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendsystem_tpu import nn as rnn
from recommendsystem_tpu.kernels import set_backend
from recommendsystem_tpu.kernels.din_pallas import din_pool, _din_block
from recommendsystem_tpu.kernels.interacting_pallas import (
    _reference, interacting_attention)


def make_params(d=8, u=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    init = jax.nn.initializers.glorot_uniform()
    return {
        "wq": init(ks[0], (d, u)), "bq": jnp.zeros((u,)),
        "wk": init(ks[1], (d, u)), "bk": jnp.zeros((u,)),
        "wv": init(ks[2], (d, u)), "bv": jnp.zeros((u,)),
        "wr": init(ks[3], (d, u)), "br": jnp.zeros((u,)),
        "gamma": jnp.ones((u,)), "beta": jnp.zeros((u,)),
    }


class TestInteractingKernel:
    def test_matches_xla_reference(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 13, 8))
        p = make_params()
        got = interacting_attention(x, p, 2, 1e-3)
        want = _reference(x, p, 2, 1e-3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_flow(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 5, 8))
        p = make_params()

        def loss_k(x_, p_):
            return jnp.sum(interacting_attention(x_, p_, 2, 1e-3) ** 2)

        def loss_r(x_, p_):
            return jnp.sum(_reference(x_, p_, 2, 1e-3) ** 2)

        gx_k, gp_k = jax.grad(loss_k, argnums=(0, 1))(x, p)
        gx_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(x, p)
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-5)
        for k in p:
            np.testing.assert_allclose(np.asarray(gp_k[k]), np.asarray(gp_r[k]),
                                       rtol=1e-4, atol=1e-5, err_msg=k)

    def test_layer_module_paths_agree(self):
        """InteractingLayer with forced pallas == forced xla (eval mode)."""
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 8))
        m = rnn.InteractingLayer(layer_num=2, unit_num=8, head_num=2,
                                 use_dropout=True, dropout_rate=0.2)
        v = m.init({"params": jax.random.PRNGKey(1)}, x)
        try:
            set_backend("xla")
            out_xla = m.apply(v, x)
            set_backend("pallas")
            out_pl = m.apply(v, x)
        finally:
            set_backend(None)
        np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                                   rtol=2e-5, atol=2e-5)


class TestDINKernel:
    def _inputs(self, b=12, t=7, h=16, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 6)
        q = jax.random.normal(ks[0], (b, h))
        f = jax.random.normal(ks[1], (b, t, h))
        lens = jax.random.randint(ks[2], (b,), 1, t + 1)
        mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
        init = jax.nn.initializers.glorot_uniform()
        w1 = init(ks[3], (4 * h, 16))
        b1 = jnp.zeros((16,))
        w2 = init(ks[4], (16, 1))
        b2 = jnp.zeros((1,))
        return q, f, mask, w1, b1, w2, b2

    def test_matches_block(self):
        args = self._inputs()
        got = din_pool(*args)
        want = _din_block(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_flow(self):
        q, f, mask, w1, b1, w2, b2 = self._inputs(b=6, t=5)

        def loss_k(q_, f_, w1_):
            return jnp.sum(din_pool(q_, f_, mask, w1_, b1, w2, b2) ** 2)

        def loss_r(q_, f_, w1_):
            return jnp.sum(_din_block(q_, f_, mask, w1_, b1, w2, b2) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, f, w1)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, f, w1)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)

    def test_module_paths_agree(self):
        q, f, mask, *_ = self._inputs()
        m = rnn.DINPool()
        v = m.init(jax.random.PRNGKey(0), q, f, mask)
        try:
            set_backend("xla")
            out_xla = m.apply(v, q, f, mask)
            set_backend("pallas")
            out_pl = m.apply(v, q, f, mask)
        finally:
            set_backend(None)
        np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                                   rtol=2e-5, atol=2e-5)
