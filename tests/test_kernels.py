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


class TestFieldAttention:
    """Flash-style field attention (``field_attention_pallas``): F x F x B
    score tensors never touch HBM.  rate=0 paths run in interpret mode on
    CPU; the in-kernel PRNG dropout has no CPU lowering, so its determinism
    / distribution / fwd-bwd-mask-consistency checks are TPU-gated (the
    on-chip A/B record lives in scripts/probe20.py)."""

    def _qkv(self, h=2, dh=4, f=11, b=128, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        return tuple(jax.random.normal(k, (h, dh, f, b)) for k in ks)

    def test_forward_matches_reference_with_field_padding(self):
        from recommendsystem_tpu.kernels.field_attention_pallas import (
            eligible, field_attention, field_attention_reference)
        q, k, v = self._qkv(f=11)          # 11 pads to 16; keys masked -inf
        assert eligible(2, 4, 11, 128)
        got = field_attention(q, k, v, 0, 0.0)
        want = field_attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_reference(self):
        from recommendsystem_tpu.kernels.field_attention_pallas import (
            field_attention, field_attention_reference)
        q, k, v = self._qkv(f=8)
        g = jax.random.normal(jax.random.PRNGKey(9), q.shape)
        gk = jax.grad(lambda *a: jnp.sum(field_attention(*a, 0, 0.0) * g),
                      argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: jnp.sum(field_attention_reference(*a) * g),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b2 in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       rtol=1e-4, atol=1e-5)

    def test_eligibility_rules(self):
        from recommendsystem_tpu.kernels.field_attention_pallas import eligible
        assert eligible(2, 4, 175, 8192)        # production ctr regime
        assert eligible(2, 4, 24, 65536)        # headline regime
        assert not eligible(2, 4, 24, 100)      # batch not lane-divisible
        assert not eligible(1, 512, 212, 128)   # VMEM budget exceeded

    def test_interacting_layer_flash_path_matches_xla(self, monkeypatch):
        """InteractingLayer with the flash core forced on (interpret mode)
        equals the XLA attention path at deterministic settings."""
        from recommendsystem_tpu.kernels import flags
        layer = rnn.InteractingLayer(layer_num=2, unit_num=8, head_num=2,
                                     use_dropout=True, dropout_rate=0.2,
                                     use_res=True)
        x = jax.random.normal(jax.random.PRNGKey(3), (128, 9, 8))
        params = layer.init(jax.random.PRNGKey(0), x, training=False)
        base = layer.apply(params, x, training=False)
        monkeypatch.setattr(flags, "use_flash", lambda: True)
        flash = layer.apply(params, x, training=False)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(base),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                        reason="in-kernel PRNG has no CPU lowering")
    def test_dropout_deterministic_per_seed_tpu(self):
        from recommendsystem_tpu.kernels.field_attention_pallas import (
            field_attention)
        q, k, v = self._qkv(f=8)
        a = field_attention(q, k, v, 7, 0.2)
        b2 = field_attention(q, k, v, 7, 0.2)
        c = field_attention(q, k, v, 8, 0.2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0

    @pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                        reason="in-kernel PRNG has no CPU lowering")
    def test_dropout_bwd_regenerates_fwd_mask_tpu(self):
        """Finite differences THROUGH the kernel agree with the custom
        backward — only possible if the backward regenerates the forward's
        exact dropout mask from the seed."""
        from recommendsystem_tpu.kernels.field_attention_pallas import (
            field_attention)
        q, k, v = self._qkv(f=8)
        g = jax.random.normal(jax.random.PRNGKey(5), q.shape)
        loss = lambda q_: jnp.sum(field_attention(q_, k, v, 7, 0.2) * g)
        gq = jax.grad(loss)(q)
        eps = 1e-2
        for idx in [(0, 0, 0, 0), (1, 2, 3, 17), (0, 3, 7, 100)]:
            fd = (loss(q.at[idx].add(eps)) - loss(q.at[idx].add(-eps))) / (2 * eps)
            assert abs(float(fd) - float(gq[idx])) < 5e-2 * max(1.0, abs(float(fd))), idx
