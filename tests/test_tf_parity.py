"""Numerical parity against real TensorFlow for the attention layers.

Re-executes the reference's TF op sequences (``InteractingLayer.py:37-61``,
``staytime/layer.py:16-41``) as inline tf ops with OUR initialized weights,
and asserts our JAX layers produce the same outputs — the AUC-parity
discipline of SURVEY §7 grounded in the actual TF runtime (including Keras
LayerNormalization's epsilon semantics)."""

import os

import numpy as np
import pytest

# TF's oneDNN kernels misbehave (garbage values / SIGABRT on 4-D matmuls)
# when JAX-CPU is initialized in the same process; disable them for parity
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from recommendsystem_tpu import nn as rnn  # noqa: E402


def test_interacting_layer_matches_tf():
    b, f, d, u, heads = 6, 9, 8, 8, 2
    x = np.random.default_rng(0).normal(size=(b, f, d)).astype(np.float32)

    m = rnn.InteractingLayer(layer_num=2, unit_num=u, head_num=heads,
                             use_dropout=False, use_res=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(v, jnp.asarray(x)))

    p = {k: np.asarray(val) for k, val in v["params"].items()}

    # reference TF op sequence, one iteration per stacked layer, shared weights
    ln = tf.keras.layers.LayerNormalization()
    ln.build((b, f, u))
    ln.set_weights([p["ln_scale"], p["ln_bias"]])

    out = tf.constant(x)
    for _ in range(2):
        query = tf.nn.relu(tf.matmul(out, p["wq"]) + p["bq"])
        key = tf.nn.relu(tf.matmul(out, p["wk"]) + p["bk"])
        value = tf.nn.relu(tf.matmul(out, p["wv"]) + p["bv"])
        res = tf.nn.relu(tf.matmul(out, p["wr"]) + p["br"])
        query = tf.concat(tf.split(query, heads, axis=2), axis=0)
        key = tf.concat(tf.split(key, heads, axis=2), axis=0)
        value = tf.concat(tf.split(value, heads, axis=2), axis=0)
        weight = tf.matmul(query, tf.transpose(key, [0, 2, 1]))
        weight = weight / (key.shape[-1] ** 0.5)
        weight = tf.nn.softmax(weight)
        out = tf.matmul(weight, value)
        out = tf.concat(tf.split(out, heads, axis=0), axis=2)
        out = out + res
        out = tf.nn.relu(out)
        out = ln(out)
    theirs = out.numpy()

    np.testing.assert_allclose(ours, theirs, rtol=3e-5, atol=3e-5)


def test_din_pool_matches_tf():
    b, t, h = 5, 7, 16
    rng = np.random.default_rng(1)
    query = rng.normal(size=(b, h)).astype(np.float32)
    facts = rng.normal(size=(b, t, h)).astype(np.float32)
    lens = rng.integers(1, t + 1, size=b)
    mask = (np.arange(t)[None, :] < lens[:, None])

    m = rnn.DINPool()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(query), jnp.asarray(facts),
               jnp.asarray(mask))
    ours = np.asarray(m.apply(v, jnp.asarray(query), jnp.asarray(facts),
                              jnp.asarray(mask)))
    p = {k: np.asarray(val) for k, val in v["params"].items()}

    # reference TF op sequence (staytime/layer.py:16-41)
    queries = tf.reshape(tf.tile(tf.constant(query), [1, t]), facts.shape)
    din_all = tf.concat([queries, facts, queries - facts, queries * facts], axis=-1)
    d1 = tf.sigmoid(tf.matmul(din_all, p["w1"]) + p["b1"])
    d2 = tf.matmul(d1, p["w2"]) + p["b2"]
    scores = tf.reshape(d2, [-1, 1, t])
    key_masks = tf.expand_dims(tf.constant(mask), 1)
    paddings = tf.ones_like(scores) * (-2 ** 32 + 1)
    scores = tf.where(key_masks, scores, paddings)
    scores = tf.nn.softmax(scores)
    out = tf.squeeze(tf.matmul(scores, tf.constant(facts)), [1]).numpy()

    np.testing.assert_allclose(ours, out, rtol=3e-5, atol=3e-5)


def test_general_din_matches_tf():
    """din.py variant: zero-mask, relu scorer, NO softmax (din.py:18-47)."""
    b, t, h = 4, 6, 8
    rng = np.random.default_rng(2)
    q = rng.normal(size=(b, h)).astype(np.float32)
    keys = rng.normal(size=(b, t, h)).astype(np.float32)
    vals = rng.normal(size=(b, t, h)).astype(np.float32)
    lens = rng.integers(1, t + 1, size=b)
    mask = np.arange(t)[None, :] < lens[:, None]

    m = rnn.DINAttention()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(keys),
               jnp.asarray(vals), mask=jnp.asarray(mask))
    ours = np.asarray(m.apply(v, jnp.asarray(q), jnp.asarray(keys),
                              jnp.asarray(vals), mask=jnp.asarray(mask)))
    p = v["params"]
    w0, b0 = np.asarray(p["din_nn_0"]["kernel"]), np.asarray(p["din_nn_0"]["bias"])
    w1, b1 = np.asarray(p["din_nn_1"]["kernel"]), np.asarray(p["din_nn_1"]["bias"])

    queries = tf.expand_dims(tf.expand_dims(tf.constant(q), 1), 2)  # (B,1,1,H)
    queries = tf.tile(queries, [1, 1, t, 1])                         # (B,1,T,H)
    k4 = tf.expand_dims(tf.constant(keys), 1)                        # (B,1,T,H)
    deep = tf.concat([queries, k4, queries * k4], axis=-1)
    deep = tf.nn.relu(tf.matmul(deep, w0) + b0)
    deep = tf.nn.relu(tf.matmul(deep, w1) + b1)
    deep = tf.squeeze(deep, axis=-1)                                 # (B,1,T)
    masks = tf.expand_dims(tf.constant(mask), 1)
    deep = tf.where(masks, deep, tf.zeros_like(deep))
    out = tf.squeeze(tf.matmul(deep, tf.constant(vals)), [1]).numpy()

    np.testing.assert_allclose(ours, out, rtol=3e-5, atol=3e-5)
