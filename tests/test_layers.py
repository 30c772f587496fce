"""Unit tests for the canonical layer library — golden values vs NumPy
re-implementations of the reference TF semantics (SURVEY §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendsystem_tpu import nn as rnn


def init_and_apply(module, *args, training=False, seed=0, **kwargs):
    rngs = {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)}
    variables = module.init(rngs, *args, training=training, **kwargs) \
        if _accepts_training(module) else module.init(rngs, *args, **kwargs)
    out = module.apply(variables, *args, training=training, rngs={"dropout": rngs["dropout"]}, **kwargs) \
        if _accepts_training(module) else module.apply(variables, *args, **kwargs)
    return variables, out


def _accepts_training(module):
    import inspect
    sig = inspect.signature(type(module).__call__)
    return "training" in sig.parameters


class TestDense:
    def test_shapes_and_activation(self):
        x = jnp.ones((4, 3))
        v, y = init_and_apply(rnn.Dense(5, activation="relu"), x)
        assert y.shape == (4, 5)
        assert (y >= 0).all()

    def test_regularizer_sows_loss(self):
        x = jnp.ones((2, 3))
        m = rnn.Dense(4, kernel_regularizer=(1e-5, 1e-5))
        v = m.init(jax.random.PRNGKey(0), x)
        out, aux = m.apply({"params": v["params"]}, x, mutable=["losses"])
        (reg,) = jax.tree.leaves(aux["losses"])
        k = v["params"]["kernel"]
        expect = 1e-5 * (np.abs(k).sum() + np.square(k).sum())
        np.testing.assert_allclose(reg, expect, rtol=1e-6)


class TestInteractingLayer:
    def _numpy_reference(self, x, params, head_num, unit_num, layer_num, use_res):
        """Direct translation of InteractingLayer.py:37-61 tf ops in numpy."""
        def dense(t, w, b):
            return np.maximum(t @ np.asarray(params[w]) + np.asarray(params[b]), 0)

        def layer_norm(t, eps=1e-3):
            mu = t.mean(-1, keepdims=True)
            var = t.var(-1, keepdims=True)
            return ((t - mu) / np.sqrt(var + eps) * np.asarray(params["ln_scale"])
                    + np.asarray(params["ln_bias"]))

        out = np.asarray(x)
        for _ in range(layer_num):
            q = dense(out, "wq", "bq")
            k = dense(out, "wk", "bk")
            v = dense(out, "wv", "bv")
            res = dense(out, "wr", "br") if use_res else None
            # tf.split(axis=2) + concat(axis=0)
            qh = np.concatenate(np.split(q, head_num, axis=2), axis=0)
            kh = np.concatenate(np.split(k, head_num, axis=2), axis=0)
            vh = np.concatenate(np.split(v, head_num, axis=2), axis=0)
            w = qh @ kh.transpose(0, 2, 1) / np.sqrt(kh.shape[-1])
            w = np.exp(w - w.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            o = w @ vh
            out = np.concatenate(np.split(o, head_num, axis=0), axis=2)
            if use_res:
                out = out + res
            out = np.maximum(out, 0)
            out = layer_norm(out)
        return out

    @pytest.mark.parametrize("heads,layers", [(1, 1), (2, 1), (2, 3)])
    def test_matches_tf_semantics(self, heads, layers):
        x = jax.random.normal(jax.random.PRNGKey(3), (5, 7, 8))
        m = rnn.InteractingLayer(layer_num=layers, unit_num=8, head_num=heads,
                                 use_dropout=False, use_res=True)
        v, y = init_and_apply(m, x)
        ref = self._numpy_reference(np.asarray(x), v["params"], heads, 8, layers, True)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)

    def test_rank_check(self):
        with pytest.raises(ValueError):
            init_and_apply(rnn.InteractingLayer(), jnp.ones((2, 3)))

    def test_dropout_active_only_in_training(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8))
        m = rnn.InteractingLayer(unit_num=8, head_num=2, use_dropout=True, dropout_rate=0.5)
        v, y_eval = init_and_apply(m, x, training=False)
        _, y_eval2 = init_and_apply(m, x, training=False)
        np.testing.assert_allclose(y_eval, y_eval2)


class TestDIN:
    def test_din_attention_masks_zero_not_inf(self):
        b, t, h = 3, 6, 4
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h))
        keys = jax.random.normal(jax.random.PRNGKey(1), (b, t, h))
        vals = jax.random.normal(jax.random.PRNGKey(2), (b, t, h))
        lengths = jnp.array([2, 6, 0])
        mask = rnn.sequence_mask(lengths, t)
        m = rnn.DINAttention()
        v, out = init_and_apply(m, q, keys, vals, mask=mask)
        assert out.shape == (b, h)
        # row with length 0 must produce exactly zeros (weights zeroed, no softmax)
        np.testing.assert_allclose(np.asarray(out[2]), np.zeros(h), atol=1e-7)

    def test_din_pool_softmax_ignores_masked(self):
        b, t, h = 2, 5, 4
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h))
        facts = jax.random.normal(jax.random.PRNGKey(1), (b, t, h))
        mask = jnp.array([[True, True, False, False, False]] * b)
        m = rnn.DINPool()
        v, out = init_and_apply(m, q, facts, mask=mask)
        assert out.shape == (b, h)
        # output must be inside the convex hull of the first two facts
        lo = np.minimum(facts[:, 0], facts[:, 1]) - 1e-5
        hi = np.maximum(facts[:, 0], facts[:, 1]) + 1e-5
        assert ((np.asarray(out) >= lo) & (np.asarray(out) <= hi)).all()


class TestCross:
    def test_deep_cross_layer_recurrence(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 6))
        m = rnn.DeepCrossLayer(num_layer=3)
        v, y = init_and_apply(m, x)
        xs = np.asarray(x)
        cross = xs
        for i in range(3):
            w = np.asarray(v["params"][f"w_{i}"])
            b = np.asarray(v["params"][f"b_{i}"])
            base = xs if i == 0 else cross
            cross = base * (cross @ w) + b + cross
        np.testing.assert_allclose(np.asarray(y), cross, rtol=1e-5)

    def test_crossnet_recurrence(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 6))
        m = rnn.CrossNet(layer_num=2)
        v, y = init_and_apply(m, x)
        x0 = np.asarray(x)
        xl = x0
        for i in range(2):
            w = np.asarray(v["params"][f"kernel{i}"])
            b = np.asarray(v["params"][f"bias{i}"])
            xl = x0 * (xl @ w) + b[:, 0] + xl
        np.testing.assert_allclose(np.asarray(y), xl, rtol=1e-4, atol=1e-5)


class TestFM:
    def test_fm3d_closed_form(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 3))
        _, y = init_and_apply(rnn.FMLayer3D(), x)
        xs = np.asarray(x)
        expect = 0.5 * (np.square(xs.sum(1)) - np.square(xs).sum(1)).sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5)
        # pairwise-interaction identity: sum_{i<j} <v_i, v_j>
        pair = sum((xs[:, i] * xs[:, j]).sum(-1) for i in range(5) for j in range(i + 1, 5))
        np.testing.assert_allclose(np.asarray(y)[:, 0], pair, rtol=1e-4)

    def test_fm_cross_term_matches_3d(self):
        embs = [jax.random.normal(jax.random.PRNGKey(i), (4, 3)) for i in range(5)]
        cross, logit = rnn.fm_cross_term(embs)
        _, y3d = init_and_apply(rnn.FMLayer3D(), jnp.stack(embs, axis=1))
        np.testing.assert_allclose(np.asarray(logit), np.asarray(y3d), rtol=1e-5)

    def test_deepfm_layer(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
        m = rnn.DeepFMLayer()
        v, y = init_and_apply(m, x)
        assert y.shape == (4, 1)
        V = np.asarray(v["params"]["weight"])
        xs = np.asarray(x)
        high = 0.5 * (np.square(xs @ V) - np.square(xs) @ np.square(V)).sum(1, keepdims=True)
        lin = xs @ np.asarray(v["params"]["deeepfmlinear"]["kernel"]) + \
            np.asarray(v["params"]["deeepfmlinear"]["bias"])
        np.testing.assert_allclose(np.asarray(y), high + lin, rtol=1e-4)

    def test_ffm_block(self):
        slot_dict = {s: jax.random.normal(jax.random.PRNGKey(int(s)), (4, 16))
                     for s in ["1", "2", "3", "4"]}
        m = rnn.FFMBlock(ffm_slots=((("1", "2"), ("3", "4"), 8),))
        v, y = init_and_apply(m, slot_dict)
        assert y.shape == (4, 4 * 8)


class TestSENet:
    @pytest.mark.parametrize("squeeze", ["mean", "concat"])
    def test_gates_bounded(self, squeeze):
        embs = [jax.random.normal(jax.random.PRNGKey(i), (4, 16)) for i in range(8)]
        m = rnn.SENet(squeeze=squeeze)
        v, outs = init_and_apply(m, embs)
        assert len(outs) == 8
        for o, e in zip(outs, embs):
            on, en = np.asarray(o), np.asarray(e)
            big = np.abs(en) > 1e-2          # avoid 0/0 in the ratio check
            ratio = np.where(big, on / np.where(big, en, 1.0), np.nan)
            ref = np.nanmean(ratio, axis=1, keepdims=True)
            # per-field scalar gate in (0, 2), constant across the embedding dim
            np.testing.assert_allclose(np.where(big, ratio, ref),
                                       np.broadcast_to(ref, ratio.shape), rtol=1e-3)
            assert (ref > 0).all() and (ref < 2).all()


class TestMoE:
    def test_mmoe_num_tasks_and_softmax_pool(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 12))
        m = rnn.MMOE(num_tasks=2, num_experts=3, expert_dnn_units=(8,))
        v, outs = init_and_apply(m, x)
        assert len(outs) == 2 and outs[0].shape == (4, 8)

    def test_ple_output(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 12))
        m = rnn.PLE(num_tasks=2, num_shared_experts=4, num_specific_experts=4,
                    expert_dnn_units=(32,))
        v, outs = init_and_apply(m, x)
        assert len(outs) == 2 and outs[0].shape == (4, 32)


class TestMisc:
    def test_similarity(self):
        u = jnp.array([[1.0, 2.0], [0.0, 1.0]])
        i = jnp.array([[3.0, 4.0], [1.0, 1.0]])
        _, y = init_and_apply(rnn.Similarity(), (u, i))
        np.testing.assert_allclose(np.asarray(y), [[11.0], [1.0]])

    def test_kd_loss(self):
        s = jnp.array([[1.0], [2.0]])
        t = jnp.array([[1.5], [2.0]])
        np.testing.assert_allclose(np.asarray(rnn.kd_loss(s, t)), [0.25, 0.0])

    def test_gate_tower_and_bank(self):
        g = jax.random.normal(jax.random.PRNGKey(0), (4, 6))
        _, y = init_and_apply(rnn.GateTower(out_units=8, hidden_units=4), g)
        assert y.shape == (4, 8) and (np.asarray(y) > 0).all() and (np.asarray(y) < 2).all()
        _, gates = init_and_apply(rnn.PPNetGateBank(splits=(3, 5)), g)
        assert gates[0].shape == (4, 3) and gates[1].shape == (4, 5)


class TestEdgeCases:
    def test_din_attention_multi_query(self):
        """F>1 query branch of the general DIN (din.py supports [B,F,H])."""
        b, f, t, h = 3, 4, 6, 8
        q = jax.random.normal(jax.random.PRNGKey(0), (b, f, h))
        keys = jax.random.normal(jax.random.PRNGKey(1), (b, t, h))
        vals = jax.random.normal(jax.random.PRNGKey(2), (b, t, h))
        m = rnn.DINAttention()
        v, out = init_and_apply(m, q, keys, vals)
        assert out.shape == (b, f, h)
        # row f of the multi-query output == single-query output for that row
        v1, out1 = init_and_apply(m, q[:, 0, :], keys, vals)
        out_single = m.apply(v, q[:, 0, :], keys, vals)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out_single),
                                   rtol=1e-5)

    def test_sequence_mask(self):
        m = rnn.sequence_mask(jnp.array([0, 2, 5]), 4)
        np.testing.assert_array_equal(
            np.asarray(m), [[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]])

    def test_mmoe_gate_weights_sum_to_one(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 12))
        m = rnn.MMOE(num_tasks=1, num_experts=3, expert_dnn_units=(8,))
        v = m.init(jax.random.PRNGKey(1), x)
        # replace all experts with identity-ish constants to expose the gate
        outs = m.apply(v, x)
        assert np.isfinite(np.asarray(outs[0])).all()
