"""Full-model TF training parity for STAYTIME — the richest zoo member
(VERDICT r3 #5): N-step training of our JAX bundle vs a real-TensorFlow twin
re-executing the reference's op sequence (``staytime/VideoDnn.py:27-215``,
``staytime/model.py:20-36``) with THE SAME initial weights and THE SAME
batches.  In play: sequence columns feeding DINPool (the -2^32-mask softmax
convention, ``staytime/layer.py:32-35``), SENet concat squeeze, user x item
multiply, listwise FM, FFM pairs, PPNet-gated experts, MMoE gates,
DeepCross + 400-bin EV head, KL(2.0) + CE(2.0) + CE(1.0) losses, per-row
lazy AdaGrad on the tables (``tn.core.AdaGrad``, ``VideoDnn.py:233``) and
keras Adam on the dense params (``model.py:72``).

The config is a structurally-identical shrunken StaytimeConfig (16 slots in
the same roles) so the eager TF twin stays fast; every block of the full
graph executes.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from recommendsystem_tpu.embedding.engine import IdBatch  # noqa: E402
from recommendsystem_tpu.models import create_model  # noqa: E402
from recommendsystem_tpu.models.staytime import (  # noqa: E402
    BIN_LIST, MULTICLASS_NUM, StaytimeConfig, T_LONG, T_SHORT, T_STAY)
from recommendsystem_tpu.train import create_train_state  # noqa: E402
from recommendsystem_tpu.train.step import (  # noqa: E402
    make_predict_step, make_train_step)

MASK_PAD = -(2.0 ** 32) + 1.0
K_EPS = 1e-7

SLOTS = tuple(str(9000 + i) for i in range(16))
CFG = StaytimeConfig(
    slots=SLOTS,
    seq_slots=(SLOTS[8], SLOTS[9], SLOTS[10]),
    user_slots=SLOTS[0:4],
    item_slots=SLOTS[4:8],
    bias_slots=(SLOTS[0], SLOTS[2], SLOTS[4], SLOTS[6], SLOTS[11], SLOTS[12]),
    seq_query=((SLOTS[8], SLOTS[4]), (SLOTS[9], SLOTS[5]),
               (SLOTS[10], SLOTS[6])),
    seq_max_len=5,
    bucket_size=64,
)
HIDDEN = (16, 8)
BATCH, L, N_STEPS = 48, 2, 60
LR_SPARSE, G2SUM0 = 5e-3, 0.1


def _make_batches(rng, bucket):
    batches = []
    for _ in range(N_STEPS + 1):
        ids = {s: rng.integers(0, bucket, size=(BATCH, L)).astype(np.int32)
               for s in SLOTS}
        mask = {}
        for s in SLOTS:
            lens = rng.integers(1, L + 1, size=(BATCH,))
            mask[s] = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
        seq_ids, seq_mask = {}, {}
        for s in CFG.seq_slots:
            t = CFG.seq_max_len
            seq_ids[s] = rng.integers(0, bucket,
                                      size=(BATCH, t)).astype(np.int32)
            lens = rng.integers(1, t + 1, size=(BATCH,))
            seq_mask[s] = (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
        # learnable labels: the first id of slot 0 picks the staytime bin,
        # slots 1/2 drive the binary heads
        bins = (ids[SLOTS[0]][:, 0] * MULTICLASS_NUM // bucket).astype(np.int64)
        y_st = np.zeros((BATCH, MULTICLASS_NUM + 1), np.float32)
        y_st[np.arange(BATCH), bins] = 1.0
        y_st[:, -1] = bins * 0.5 - 19.0          # raw label tail (unused)
        y_sp = (ids[SLOTS[1]][:, 0] < bucket // 2).astype(np.float32)[:, None]
        y_lp = (ids[SLOTS[2]][:, 0] < bucket // 2).astype(np.float32)[:, None]
        batches.append((ids, mask, seq_ids, seq_mask,
                        {T_STAY: y_st, T_SHORT: y_sp, T_LONG: y_lp}))
    return batches


def _jax_batch(ids, mask, seq_ids, seq_mask):
    b = {s: IdBatch(jnp.asarray(ids[s]), jnp.asarray(mask[s]))
         for s in SLOTS}
    for s in CFG.seq_slots:
        b[f"seq_{s}"] = IdBatch(jnp.asarray(seq_ids[s]),
                                jnp.asarray(seq_mask[s]))
    return b


def test_staytime_full_model_training_parity():
    bundle = create_model("staytime", cfg=CFG, deep_hidden_units=HIDDEN)
    eng = bundle.embedding
    bucket = CFG.bucket_size

    rng = np.random.default_rng(7)
    batches = _make_batches(rng, bucket)

    # ---- JAX side ----
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               _jax_batch(*batches[0][:4]))
    w0 = {}
    for s in SLOTS:
        skey, off, rows = eng.table_map[s]
        w0[s] = np.asarray(state.tables[skey]["w"][off:off + rows])
    p0 = jax.tree.map(np.asarray, state.params)

    step_fn = make_train_step(bundle, donate=False)
    weight = np.ones((BATCH, 1), np.float32)
    jax_losses = []
    st = state
    for i in range(N_STEPS):
        ids, mask, seq_ids, seq_mask, labels = batches[i]
        st, info = step_fn(st, _jax_batch(ids, mask, seq_ids, seq_mask),
                           labels, weight, None, jax.random.PRNGKey(0))
        jax_losses.append(float(info["loss"]))
    pred_fn = make_predict_step(bundle)
    jax_pred = pred_fn(st, _jax_batch(*batches[-1][:4]), None)
    jax_ev = np.asarray(jax_pred[T_STAY])
    jax_sp = np.asarray(jax_pred[T_SHORT])

    # ---- TF twin (reference op sequence, our initial weights) ----
    tables = {s: tf.Variable(w0[s]) for s in SLOTS}

    def to_tf(tree):
        if isinstance(tree, dict):
            return {k: to_tf(v) for k, v in tree.items()}
        return tf.Variable(np.asarray(tree))

    P = to_tf(p0)
    seq_query = dict(CFG.seq_query)

    def dense(name, x, act=None):
        y = tf.matmul(x, P[name]["kernel"]) + P[name]["bias"]
        if act == "relu":
            return tf.nn.relu(y)
        if act == "sigmoid":
            return tf.sigmoid(y)
        if act == "softmax":
            return tf.nn.softmax(y)
        return y

    def tf_forward(ids, mask, seq_ids, seq_mask):
        embs = {}
        for s in SLOTS:
            e = tf.gather(tables[s], ids[s])
            m = tf.constant(mask[s])[:, :, None]
            embs[s] = tf.reduce_sum(e * m, 1) / tf.maximum(tf.reduce_sum(m, 1), 1.0)
        general = {s: embs[s][:, 0:16] for s in SLOTS}
        bias_in = tf.concat([embs[s][:, 16:] for s in CFG.bias_slots], axis=1)

        # DIN over behaviour sequences (staytime/layer.py:6-41)
        din_embs = []
        for s in CFG.seq_slots:
            facts = tf.gather(tables[s], seq_ids[s])[:, :, 0:16]
            sm = tf.constant(seq_mask[s])
            facts = facts * sm[:, :, None]
            q = general[seq_query[s]]
            t = facts.shape[1]
            queries = tf.reshape(tf.tile(q, [1, t]), facts.shape)
            din_all = tf.concat([queries, facts, queries - facts,
                                 queries * facts], axis=-1)
            p = P[f"din_{s}"]
            x = tf.sigmoid(tf.matmul(din_all, p["w1"]) + p["b1"])
            x = tf.matmul(x, p["w2"]) + p["b2"]
            scores = tf.reshape(x, [-1, 1, t])
            scores = tf.where(sm[:, None, :] > 0, scores,
                              tf.ones_like(scores) * MASK_PAD)
            scores = tf.nn.softmax(scores)
            din_embs.append(tf.squeeze(tf.matmul(scores, facts), [1]))

        # SENet concat squeeze (VideoDnn.py:80-96)
        squeezed = tf.stop_gradient(
            tf.concat([general[s] for s in SLOTS], axis=-1))
        sq = P["senet"]["senet_squeeze_layer"]
        h = tf.nn.relu(tf.matmul(squeezed, sq["kernel"]) + sq["bias"])
        ex = P["senet"]["senet_extract_layer"]
        gates = 2.0 * tf.sigmoid(tf.matmul(h, ex["kernel"]) + ex["bias"])
        general_rw = [general[s] * gates[:, i:i + 1]
                      for i, s in enumerate(SLOTS)]

        # user x item multiply (VideoDnn.py:98-105)
        mu = tf.concat([general[s] for s in CFG.user_slots], axis=-1)
        mi = tf.concat([general[s] for s in CFG.item_slots], axis=-1)
        multiply = tf.nn.relu(mu * mi)

        # listwise FM (VideoDnn.py:107-115)
        stacked = tf.stack(general_rw, axis=0)
        sum_embs = tf.reduce_sum(stacked, axis=0)
        cross = sum_embs * sum_embs - tf.reduce_sum(stacked * stacked, axis=0)
        fm_logit = 0.5 * tf.reduce_sum(cross, axis=-1, keepdims=True)

        # FFM pairs (VideoDnn.py:11-25, 117-120)
        ffm_parts = []
        for x_s in CFG.user_slots:
            for y_s in CFG.item_slots:
                px = P["ffm"][f"ffm_x_{x_s}_{y_s}_8"]
                py = P["ffm"][f"ffm_y_{x_s}_{y_s}_8"]
                xe = tf.matmul(general[x_s], px["kernel"]) + px["bias"]
                ye = tf.matmul(general[y_s], py["kernel"]) + py["bias"]
                ffm_parts.append(xe * ye)
        ffm = tf.concat(ffm_parts, axis=-1)

        concated = tf.concat(general_rw + [cross, multiply, ffm] + din_embs,
                             axis=-1)

        # PPNet-gated experts (VideoDnn.py:129-151)
        experts = []
        for i in range(CFG.num_experts):
            deep = concated
            for j, _ in enumerate(HIDDEN):
                g = dense(f"gate_{i}_{j}_1", bias_in, "relu")
                g = dense(f"gate_{i}_{j}_2", g, "sigmoid") * 2
                deep = dense(f"expert_output_{i}_{j}", deep, "relu")
                deep = g * deep
            experts.append(deep)
        experts = tf.stack(experts, axis=1)                  # (B, E, D)

        # MMoE gates (VideoDnn.py:153-164)
        mmoe = []
        for i in range(CFG.num_tasks):
            g = concated
            for j in range(2):
                g = dense(f"gate_{i}_{j}", g, "relu")
            g = dense(f"gate_output_{i}", g, "softmax")      # (B, E)
            mmoe.append(tf.einsum("bed,be->bd", experts, g))

        # DeepCross + 400-bin EV head (staytime/layer.py:44-80,
        # VideoDnn.py:167-179)
        cross_f = concated
        for i in range(3):
            w = P["dcn"][f"w_{i}"]
            b = P["dcn"][f"b_{i}"]
            scalar = tf.matmul(cross_f, w)
            base = concated if i == 0 else cross_f
            cross_f = base * scalar + b + cross_f
        mmoe_ext = tf.concat([mmoe[0], cross_f], axis=-1)
        st_dist = tf.nn.softmax(dense("staytime_output", mmoe_ext))
        wt = tf.constant(np.asarray(BIN_LIST, np.float32).reshape(-1, 1))
        ev = tf.matmul(st_dist, wt)
        ev = tf.where(ev < 0.0, tf.zeros_like(ev), ev)

        # binary towers fused with the FM logit (VideoDnn.py:181-191)
        sp = dense("shortplay_pred",
                   tf.concat([fm_logit,
                              dense("tower_deep_shortplay", mmoe[1], "relu")],
                             axis=1), "sigmoid")
        lp = dense("longplay_pred",
                   tf.concat([fm_logit,
                              dense("tower_deep_longplay", mmoe[2], "relu")],
                             axis=1), "sigmoid")
        return st_dist, ev, sp, lp

    def tf_loss(labels, st_dist, sp, lp):
        y1 = tf.clip_by_value(labels[T_STAY][:, :MULTICLASS_NUM], K_EPS, 1.0)
        p1 = tf.clip_by_value(st_dist, K_EPS, 1.0)
        kl = tf.reduce_mean(tf.reduce_sum(y1 * tf.math.log(y1 / p1), axis=-1))
        def ce(y, p):
            return tf.reduce_mean(- y * tf.math.log(p + 1e-6)
                                  - (1 - y) * tf.math.log(1 - p + 1e-6))
        return 2.0 * kl + 2.0 * ce(labels[T_SHORT], sp) + ce(labels[T_LONG], lp)

    dense_vars = tf.nest.flatten(P)
    opt = tf.keras.optimizers.Adam(5e-4, beta_1=0.9, beta_2=0.999,
                                   epsilon=1e-8)
    # table rows pad past bucket_size for lane-pack alignment; size the
    # per-row state from the actual (padded) table
    g2sum = {s: np.full((w0[s].shape[0], 1), G2SUM0, np.float32)
             for s in SLOTS}

    tf_losses = []
    for i in range(N_STEPS):
        ids, mask, seq_ids, seq_mask, labels = batches[i]
        with tf.GradientTape() as tape:
            st_dist, ev, sp, lp = tf_forward(ids, mask, seq_ids, seq_mask)
            loss = tf_loss(labels, st_dist, sp, lp)
        tf_losses.append(float(loss))
        tvars = [tables[s] for s in SLOTS]
        grads = tape.gradient(loss, dense_vars + tvars)
        opt.apply_gradients(zip(grads[:len(dense_vars)], dense_vars))
        # per-row lazy AdaGrad (tn.core.AdaGrad, VideoDnn.py:233): touched =
        # rows with a live (masked-in) occurrence in the mean OR seq stream
        for s, g in zip(SLOTS, grads[len(dense_vars):]):
            g = tf.convert_to_tensor(g).numpy()
            cnt = np.zeros(w0[s].shape[0], np.float32)
            np.add.at(cnt, ids[s].reshape(-1), mask[s].reshape(-1))
            if s in CFG.seq_slots:
                np.add.at(cnt, seq_ids[s].reshape(-1),
                          seq_mask[s].reshape(-1))
            touched = cnt > 0
            g2 = np.mean(np.square(g), axis=-1, keepdims=True)
            g2sum[s][touched] += g2[touched]
            new = tables[s].numpy()
            new[touched] -= LR_SPARSE * g[touched] / np.sqrt(g2sum[s][touched])
            tables[s].assign(new)

    _, tf_ev, tf_sp, _ = tf_forward(*batches[-1][:4])
    tf_ev, tf_sp = tf_ev.numpy(), tf_sp.numpy()

    jax_losses = np.asarray(jax_losses)
    tf_losses = np.asarray(tf_losses)
    # per-step loss tracking, tolerance widening with accumulated fp32 drift
    np.testing.assert_allclose(jax_losses[:10], tf_losses[:10], rtol=5e-4)
    np.testing.assert_allclose(jax_losses[:30], tf_losses[:30], rtol=5e-3)
    np.testing.assert_allclose(jax_losses, tf_losses, rtol=3e-2)
    assert jax_losses[-1] < jax_losses[0]
    # held-out predictions agree: EV within bin-scale error, binary heads
    # tightly correlated
    ev_diff = np.abs(jax_ev - tf_ev)
    assert ev_diff.max() < 0.5, ev_diff.max()        # EV spans [-19, 180]
    assert np.corrcoef(jax_ev.ravel(), tf_ev.ravel())[0, 1] > 0.99
    sp_diff = np.abs(jax_sp - tf_sp)
    assert sp_diff.max() < 0.02, sp_diff.max()
    assert np.corrcoef(jax_sp.ravel(), tf_sp.ravel())[0, 1] > 0.995
