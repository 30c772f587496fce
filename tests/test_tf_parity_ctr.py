"""Full-model TF training parity for the PRODUCTION CTR graph (VERDICT r4
#5): N-step training of our JAX bundle vs a real-TensorFlow twin
re-executing the reference's op sequence (``rank/ctr/model_init.py:19-162``
on the ``base_model.py`` feature machinery) with THE SAME initial weights
and THE SAME batches.  In play, end to end: wide shared-slot rows with
per-feature intervals (``base_model.py:134-158``), all four bias splits
(ppnet / can / multiply_user / multiply_item), mean-squeeze SENet, per-field
8-d linear maps, the AutoInt interacting layer (shared projections, head
fold, residual, LayerNorm eps 1e-3), the PPNet gate bank with the
(256,64,8,256,64,8,32,16) splits, the L1L2(1e-5)-regularized gated deep
tower, CAN micro-net weights generated from bias embeddings and applied at
the last output layer, 2-task MMoE with per-layer 2*sigmoid expert gates,
clip(1e-6, 1), summed-then-meaned CE per task, per-row lazy Adam 5e-5 on
the tables (``tn.core.Adam``, ``base_model.py:163``) and Adam 5e-5 on the
dense params (``base_model.py:192``).

The config is a structurally-complete shrunken model_parameter.json (16
general features over 8 shared slots + one bias feature of each type), so
the eager TF twin stays fast while every block executes.  Attention
dropout is 0 on both sides (cross-framework PRNGs cannot match; the
reference rate 0.2 stays the production default — see
``CTRModule.attention_dropout_rate``).
"""

import os

import numpy as np
import pytest

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from recommendsystem_tpu.core.config import load_model_parameter_json  # noqa: E402
from recommendsystem_tpu.embedding.engine import IdBatch  # noqa: E402
from recommendsystem_tpu.models import create_model  # noqa: E402
from recommendsystem_tpu.models.ctr import (  # noqa: E402
    PPNET_SPLITS, T_CLICK, T_EFFECT)
from recommendsystem_tpu.train import create_train_state  # noqa: E402
from recommendsystem_tpu.train.step import (  # noqa: E402
    make_predict_step, make_train_step)

BUCKET, BATCH, L, N_STEPS = 64, 48, 2, 60
LR = 5e-5                         # sparse AND dense (base_model.py:163,192)
B1, B2, EPS = 0.9, 0.999, 1e-8
DEEP = (32, 16)
EXPERT = (512, 256)
GATE_H = (256, 32)
OUT_H = (64, 8)
REG_L1 = REG_L2 = 1e-5

SLOTS = tuple(str(100 + i) for i in range(8))
GATE_SLOTS = (SLOTS[0], SLOTS[3], SLOTS[5])


def _raw_config():
    """16 general features over 8 shared slots (2 per slot -> per-feature
    intervals [0,8) / [8,16) inside one wide row) + one bias feature of
    each type appended to the first four slots' rows (-> width 24 there,
    max_embed_size 24 everywhere)."""
    sparse = {}
    for i, slot in enumerate(SLOTS):
        sparse[f"f{i}_a"] = {"emb_size": 8, "slot_id": [slot]}
        sparse[f"f{i}_b"] = {"emb_size": 8, "slot_id": [slot]}
    for slot, btype in zip(SLOTS[:4], ("ppnet", "can", "multiply_user",
                                       "multiply_item")):
        sparse[f"bias_{btype}"] = {"emb_size": 8, "slot_id": [slot],
                                   "bias": 8, "bias_type": btype}
    return {"feature_slot": {"sparse_feature": sparse,
                             "sequence_feature": {}, "dense_feature": {}}}


def _make_batches(rng):
    batches = []
    for _ in range(N_STEPS + 1):
        ids = {s: rng.integers(0, BUCKET, size=(BATCH, L)).astype(np.int32)
               for s in SLOTS}
        mask = {}
        for s in SLOTS:
            lens = rng.integers(1, L + 1, size=(BATCH,))
            mask[s] = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
        y_click = (ids[SLOTS[4]][:, 0] < BUCKET // 2).astype(np.float32)[:, None]
        y_eff = (ids[SLOTS[5]][:, 0] < BUCKET // 2).astype(np.float32)[:, None]
        batches.append((ids, mask, {T_CLICK: y_click, T_EFFECT: y_eff}))
    return batches


def _jb(ids, mask):
    return {s: IdBatch(jnp.asarray(ids[s]), jnp.asarray(mask[s]))
            for s in SLOTS}


def test_ctr_full_model_training_parity():
    cfg = load_model_parameter_json(_raw_config())
    assert cfg.max_embed_size == 24
    bundle = create_model("ctr", cfg=cfg, gate_slots=GATE_SLOTS,
                          bucket_size=BUCKET, attention_dropout_rate=0.0)
    eng = bundle.embedding

    rng = np.random.default_rng(11)
    batches = _make_batches(rng)

    # ---- JAX side ----
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               _jb(*batches[0][:2]))
    w_init = eng.weights(state.tables)
    w0 = {}
    for s in SLOTS:
        skey, off, rows = eng.table_map[s]
        w0[s] = np.asarray(w_init[skey][off:off + rows])
    p0 = jax.tree.map(np.asarray, state.params)

    step_fn = make_train_step(bundle, donate=False)
    weight = np.ones((BATCH, 1), np.float32)
    jax_losses = []
    st = state
    for i in range(N_STEPS):
        ids, mask, labels = batches[i]
        st, info = step_fn(st, _jb(ids, mask), labels, weight, None,
                           jax.random.PRNGKey(0))
        jax_losses.append(float(info["loss"]))
    pred_fn = make_predict_step(bundle)
    jax_pred = pred_fn(st, _jb(*batches[-1][:2]), None)
    jax_click = np.asarray(jax_pred[T_CLICK])
    jax_eff = np.asarray(jax_pred[T_EFFECT])

    # ---- TF twin (reference op sequence, our initial weights) ----
    tables = {s: tf.Variable(w0[s]) for s in SLOTS}

    def to_tf(tree):
        if isinstance(tree, dict):
            return {k: to_tf(v) for k, v in tree.items()}
        return tf.Variable(np.asarray(tree))

    P = to_tf(p0)

    def dense(name, x, act=None):
        y = tf.matmul(x, P[name]["kernel"]) + P[name]["bias"]
        if act == "relu":
            return tf.nn.relu(y)
        if act == "sigmoid":
            return tf.sigmoid(y)
        if act == "softmax":
            return tf.nn.softmax(y)
        return y

    n_fields = sum(len(si.intervals) for si in cfg.slot_intervals.values())

    def tf_forward(ids, mask):
        embs = {}
        for s in SLOTS:
            e = tf.gather(tables[s], ids[s])
            m = tf.constant(mask[s])[:, :, None]
            embs[s] = tf.reduce_sum(e * m, 1) / tf.maximum(
                tf.reduce_sum(m, 1), 1.0)
        # wide-row slicing (base_model.py:134-158): structure/gate in slot
        # insertion order, bias groups over SORTED slots
        structure, gate_list = [], []
        for slot, si in cfg.slot_intervals.items():
            for s0, s1 in si.intervals:
                piece = embs[slot][:, s0:s1]
                structure.append(piece)
                if slot in GATE_SLOTS:
                    gate_list.append(piece)
        bias = {}
        for slot in sorted(cfg.bias_intervals):
            for btype, (s0, s1) in cfg.bias_intervals[slot].items():
                bias.setdefault(btype, []).append(embs[slot][:, s0:s1])

        # SENet mean squeeze (model_init.py:22-41)
        squeezed = tf.stop_gradient(tf.concat(
            [tf.reduce_mean(p_, axis=1, keepdims=True) for p_ in structure],
            axis=1))
        sq = P["senet"]["senet_squeeze_layer"]
        h = tf.nn.relu(tf.matmul(squeezed, sq["kernel"]) + sq["bias"])
        ex = P["senet"]["senet_extract_layer"]
        gates = 2.0 * tf.sigmoid(tf.matmul(h, ex["kernel"]) + ex["bias"])
        reweight = [p_ * gates[:, i:i + 1] for i, p_ in enumerate(structure)]

        # per-field linear 8-d maps -> AutoInt (model_init.py:44-60)
        emb3d = [tf.expand_dims(dense(f"emb_linear_map_{i}", p_), 1)
                 for i, p_ in enumerate(reweight)]
        x = tf.concat(emb3d, axis=1)                         # (B, F, 8)
        ip = P["interacting"]
        flat = tf.reshape(x, [-1, 8])
        q = tf.nn.relu(tf.matmul(flat, ip["wq"]) + ip["bq"])
        k = tf.nn.relu(tf.matmul(flat, ip["wk"]) + ip["bk"])
        v = tf.nn.relu(tf.matmul(flat, ip["wv"]) + ip["bv"])
        r_ = tf.nn.relu(tf.matmul(flat, ip["wr"]) + ip["br"])
        q = tf.reshape(q, [-1, n_fields, 8])
        k = tf.reshape(k, [-1, n_fields, 8])
        v = tf.reshape(v, [-1, n_fields, 8])
        r_ = tf.reshape(r_, [-1, n_fields, 8])
        qh = tf.concat(tf.split(q, 2, axis=2), axis=0)       # (2B, F, 4)
        kh = tf.concat(tf.split(k, 2, axis=2), axis=0)
        vh = tf.concat(tf.split(v, 2, axis=2), axis=0)
        att = tf.nn.softmax(tf.matmul(qh, kh, transpose_b=True) / 2.0)
        o = tf.concat(tf.split(tf.matmul(att, vh), 2, axis=0), axis=2) + r_
        o = tf.nn.relu(o)
        mu_ = tf.reduce_mean(o, axis=-1, keepdims=True)
        var = tf.reduce_mean(tf.square(o - mu_), axis=-1, keepdims=True)
        o = (o - mu_) * tf.math.rsqrt(var + 1e-3) * ip["ln_scale"] \
            + ip["ln_bias"]
        autoint_out = tf.reshape(o, [-1, n_fields * 8])

        # PPNet gate bank (model_init.py:63-68)
        pp = P["ppnet"]["dnn_ppnet_gate"]
        pg_all = 2.0 * tf.sigmoid(
            tf.matmul(tf.concat(bias["ppnet"], axis=1), pp["kernel"])
            + pp["bias"])
        ppnet_gates, start = [], 0
        for s_ in PPNET_SPLITS:
            ppnet_gates.append(pg_all[:, start:start + s_])
            start += s_

        # gated deep tower (model_init.py:70-78)
        deep = tf.concat(reweight, axis=1)
        for i, _ in enumerate(DEEP):
            deep = dense(f"dnn_{i}", deep)
            deep = tf.nn.relu(deep * ppnet_gates[i + 6])

        mu2 = tf.concat(bias["multiply_user"], axis=1)
        mi2 = tf.concat(bias["multiply_item"], axis=1)
        multiply = tf.nn.relu(mu2 * mi2)

        result = tf.concat([deep, autoint_out, multiply], axis=1)

        # CAN micro-net weights (model_init.py:91-99)
        can_raw = dense("dnn_can", tf.concat(bias["can"], axis=1))
        w1 = tf.reshape(can_raw[:, 0:48], [-1, 8, 6])
        b1 = tf.reshape(can_raw[:, 48:54], [-1, 1, 6])
        w2 = tf.reshape(can_raw[:, 54:78], [-1, 6, 4])
        b2 = tf.reshape(can_raw[:, 78:82], [-1, 1, 4])

        # MMoE experts with per-layer gates (model_init.py:101-118)
        gate_input = tf.concat(gate_list, axis=1)
        expert_outs = []
        for i in range(3):
            expert = result
            for j, _ in enumerate(EXPERT):
                g = dense(f"gate_{i}_{j}_1", gate_input, "relu")
                g = 2.0 * dense(f"gate_{i}_{j}_2", g, "sigmoid")
                expert = dense(f"expert_output_{i}_{j}", expert, "relu")
                expert = g * expert
            expert_outs.append(expert)
        experts = tf.stack(expert_outs, axis=1)              # (B, 3, 256)

        outputs = {}
        for i, task in enumerate((T_CLICK, T_EFFECT)):
            g = result
            for j, _ in enumerate(GATE_H):
                g = dense(f"gate_{i}_{j}", g, "relu")
            g = dense(f"gate_output_{i}", g, "softmax")      # (B, 3)
            r2 = tf.einsum("bed,be->bd", experts, g)
            for j, _ in enumerate(OUT_H):
                if j == 0:
                    r2 = tf.nn.relu(r2 * ppnet_gates[i * 3])
                r2 = dense(f"task{i}_dnn2_{j}", r2)
                r2 = tf.nn.relu(r2 * ppnet_gates[i * 3 + j + 1])
                if j == len(OUT_H) - 1:
                    re = tf.expand_dims(r2, 1)               # (B, 1, 8)
                    can = tf.nn.relu(tf.matmul(re, w1) + b1)
                    can = tf.nn.relu(tf.matmul(can, w2) + b2)
                    r2 = tf.concat([r2, tf.squeeze(can, 1)], axis=1)
            out = dense(f"task{i}_out", r2, "sigmoid")
            outputs[task] = tf.clip_by_value(out, 1e-6, 1.0)
        return outputs

    def tf_loss(labels, outputs):
        total = tf.constant(0.0)
        for task in (T_CLICK, T_EFFECT):
            y, p_ = labels[task], outputs[task]
            ce = - y * tf.math.log(p_ + 1e-6) \
                - (1.0 - y) * tf.math.log(1.0 - p_ + 1e-6)
            total += tf.reduce_mean(tf.reduce_sum(ce, axis=1))
        # L1L2(1e-5) on the regularized kernels (model_init.py:72-78,137-141)
        for name in [f"dnn_{i}" for i in range(len(DEEP))] + \
                [f"task{i}_dnn2_{j}" for i in range(2)
                 for j in range(len(OUT_H))]:
            k_ = P[name]["kernel"]
            total += REG_L1 * tf.reduce_sum(tf.abs(k_)) \
                + REG_L2 * tf.reduce_sum(tf.square(k_))
        return total

    dense_vars = tf.nest.flatten(P)
    opt = tf.keras.optimizers.Adam(LR, beta_1=B1, beta_2=B2, epsilon=EPS)
    # per-row Adam state sized from the actual (alignment-padded) tables
    m_s = {s: np.zeros_like(w0[s]) for s in SLOTS}
    v_s = {s: np.zeros_like(w0[s]) for s in SLOTS}
    t_s = {s: np.zeros((w0[s].shape[0], 1), np.float32) for s in SLOTS}

    tf_losses = []
    for i in range(N_STEPS):
        ids, mask, labels = batches[i]
        with tf.GradientTape() as tape:
            outputs = tf_forward(ids, mask)
            loss = tf_loss(labels, outputs)
        tf_losses.append(float(loss))
        tvars = [tables[s] for s in SLOTS]
        grads = tape.gradient(loss, dense_vars + tvars)
        opt.apply_gradients(zip(grads[:len(dense_vars)], dense_vars))
        # per-row lazy Adam (tn.core.Adam, base_model.py:163): only rows
        # with a live occurrence advance, with per-row bias correction
        for s, g in zip(SLOTS, grads[len(dense_vars):]):
            g = tf.convert_to_tensor(g).numpy()
            cnt = np.zeros(w0[s].shape[0], np.float32)
            np.add.at(cnt, ids[s].reshape(-1), mask[s].reshape(-1))
            tch = cnt > 0
            t_s[s][tch] += 1.0
            m_s[s][tch] = B1 * m_s[s][tch] + (1 - B1) * g[tch]
            v_s[s][tch] = B2 * v_s[s][tch] + (1 - B2) * np.square(g[tch])
            t_safe = np.maximum(t_s[s][tch], 1.0)
            m_hat = m_s[s][tch] / (1 - B1 ** t_safe)
            v_hat = v_s[s][tch] / (1 - B2 ** t_safe)
            new = tables[s].numpy()
            new[tch] -= LR * m_hat / (np.sqrt(v_hat) + EPS)
            tables[s].assign(new)

    tf_pred = tf_forward(*batches[-1][:2])
    tf_click = tf_pred[T_CLICK].numpy()
    tf_eff = tf_pred[T_EFFECT].numpy()

    jax_losses = np.asarray(jax_losses)
    tf_losses = np.asarray(tf_losses)
    # per-step loss tracking, tolerance widening with accumulated fp32 drift
    np.testing.assert_allclose(jax_losses[:10], tf_losses[:10], rtol=5e-4)
    np.testing.assert_allclose(jax_losses[:30], tf_losses[:30], rtol=5e-3)
    np.testing.assert_allclose(jax_losses, tf_losses, rtol=3e-2)
    # held-out per-task prediction agreement
    for name, a, b in (("click", jax_click, tf_click),
                       ("effect", jax_eff, tf_eff)):
        diff = np.abs(a - b)
        assert diff.max() < 0.02, (name, diff.max())
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.995, name
