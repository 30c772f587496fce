"""Trained-quality parity: JAX autoint vs a TF twin of the SAME graph on
the SAME synthetic Criteo-format file (BASELINE.md north star: AUC/logloss
parity, not just step-loss parity — VERDICT r4 #8).

Both sides train the identical graph (39 Criteo slots -> 8-d mean-combined
embeddings -> 1-layer 2-head interacting layer with dropout 0.2 + res +
LN(1e-3) -> MLP(32,16) branch -> concat -> Dense(1, sigmoid) -> clip,
summed-then-meaned CE, per-row lazy Adam on tables + dense Adam) on the
same batch stream, with INDEPENDENT inits/shuffles per seed — the claim is
trained-quality parity within run-to-run variance, so each framework uses
its own RNG.  Test AUC/logloss on a held-out file.

Runs entirely on CPU (one process; the TF twin needs TF, which coexists
with JAX only under TF_ENABLE_ONEDNN_OPTS=0 — CLAUDE.md).  Writes
AUC_PARITY.json at the repo root.
"""
import json
import os
import sys

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from recommendsystem_tpu.data.criteo import (
    ALL_SLOTS, criteo_autoint, criteo_dataset, write_synthetic_criteo)

TASK = "video_id_rank_skip_model"
N_TRAIN, N_TEST = 120_000, 20_000
BATCH = 512
EPOCHS = 3
BUCKET = 50_000
LR_SPARSE, LR_DENSE = 1e-2, 3e-3   # shared; elevated so a few hundred
                                   # steps learn (ref 5e-5 needs ~1e8 ex)
SEEDS = (0, 1, 2)
DIM, UNIT, HEADS = 8, 8, 2
MLP, DROP = (32, 16), 0.2


def load_batches(path, embedding):
    out = []
    for b, d, l, w, _ in criteo_dataset(path, BATCH, embedding):
        # slot widths differ (int slots L=1, cat L=2); right-pad with
        # mask-0 columns for the stacked TF-side arrays
        lmax = max(np.asarray(b[s].rows).shape[1] for s in ALL_SLOTS)

        def padded(x):
            x = np.asarray(x)
            return np.pad(x, ((0, 0), (0, lmax - x.shape[1])))

        ids = np.stack([padded(b[s].rows) for s in ALL_SLOTS])   # (39,B,L)
        mask = np.stack([padded(b[s].mask).astype(np.float32)
                         for s in ALL_SLOTS])
        out.append((b, ids, mask, np.asarray(l[TASK])))
    return out


def auc_logloss(y, p):
    from sklearn.metrics import log_loss, roc_auc_score
    return (float(roc_auc_score(y, p)),
            float(log_loss(y, np.clip(p, 1e-6, 1 - 1e-6))))


def run_jax(train_b, test_b, seed):
    import jax.numpy as jnp
    from recommendsystem_tpu.train import create_train_state
    from recommendsystem_tpu.train.step import make_predict_step, make_train_step

    bundle = criteo_autoint(dim=DIM, bucket_size=BUCKET,
                            sparse_lr=LR_SPARSE, dense_lr=LR_DENSE)
    state = create_train_state(bundle, jax.random.PRNGKey(seed),
                               train_b[0][0])
    step = make_train_step(bundle, donate=False)
    rng = jax.random.PRNGKey(seed + 1000)
    weight = np.ones((BATCH, 1), np.float32)
    k = 0
    for _ in range(EPOCHS):
        for b, _, _, y in train_b:
            rng, sub = jax.random.split(rng)
            state, info = step(state, b, {TASK: y}, weight, None, sub)
            k += 1
    pred = make_predict_step(bundle)
    ps, ys = [], []
    for b, _, _, y in test_b:
        ps.append(np.asarray(pred(state, b, None)[TASK]).ravel())
        ys.append(y.ravel())
    return auc_logloss(np.concatenate(ys), np.concatenate(ps))


def run_tf(train_b, test_b, seed):
    import tensorflow as tf
    tf.keras.utils.set_random_seed(seed)
    f, d, u, h = len(ALL_SLOTS), DIM, UNIT, HEADS
    glorot = tf.keras.initializers.GlorotUniform(seed=seed)
    tn = tf.keras.initializers.TruncatedNormal(stddev=1.0 / d ** 0.5,
                                               seed=seed + 7)
    tables = [tf.Variable(tn((BUCKET, d))) for _ in range(f)]
    P = {}
    for nm, shape in [("wq", (d, u)), ("wk", (d, u)), ("wv", (d, u)),
                      ("wr", (d, u))]:
        P[nm] = tf.Variable(glorot(shape))
        P["b" + nm[1]] = tf.Variable(tf.zeros((u,)))
    P["g"], P["b2"] = tf.Variable(tf.ones((u,))), tf.Variable(tf.zeros((u,)))
    dims = [f * d] + list(MLP)
    for i, (di, do) in enumerate(zip(dims[:-1], dims[1:])):
        P[f"mw{i}"] = tf.Variable(glorot((di, do)))
        P[f"mb{i}"] = tf.Variable(tf.zeros((do,)))
    P["ow"] = tf.Variable(glorot((MLP[-1] + f * u, 1)))
    P["ob"] = tf.Variable(tf.zeros((1,)))
    dense_vars = list(P.values())
    opt = tf.keras.optimizers.Adam(LR_DENSE)
    # per-row lazy Adam state for the tables
    m_s = [np.zeros((BUCKET, d), np.float32) for _ in range(f)]
    v_s = [np.zeros((BUCKET, d), np.float32) for _ in range(f)]
    t_s = [np.zeros((BUCKET, 1), np.float32) for _ in range(f)]

    dh = u // h

    def forward(ids, mask, training):
        fields = []
        for i in range(f):
            e = tf.gather(tables[i], ids[i])                 # (B, L, D)
            m = mask[i][:, :, None]
            fields.append(tf.reduce_sum(e * m, 1)
                          / tf.maximum(tf.reduce_sum(m, 1), 1.0))
        x = tf.stack(fields, axis=1)                         # (B, F, D)
        flat = tf.reshape(x, [-1, d])
        q = tf.nn.relu(tf.matmul(flat, P["wq"]) + P["bq"])
        k2 = tf.nn.relu(tf.matmul(flat, P["wk"]) + P["bk"])
        v = tf.nn.relu(tf.matmul(flat, P["wv"]) + P["bv"])
        r = tf.nn.relu(tf.matmul(flat, P["wr"]) + P["br"])
        q, k2, v, r = (tf.reshape(t, [-1, f, u]) for t in (q, k2, v, r))
        qh = tf.concat(tf.split(q, h, axis=2), axis=0)
        kh = tf.concat(tf.split(k2, h, axis=2), axis=0)
        vh = tf.concat(tf.split(v, h, axis=2), axis=0)
        att = tf.nn.softmax(tf.matmul(qh, kh, transpose_b=True)
                            / (dh ** 0.5))
        if training:
            att = tf.nn.dropout(att, DROP)
        o = tf.concat(tf.split(tf.matmul(att, vh), h, axis=0), axis=2) + r
        o = tf.nn.relu(o)
        mu = tf.reduce_mean(o, axis=-1, keepdims=True)
        var = tf.reduce_mean(tf.square(o - mu), axis=-1, keepdims=True)
        o = (o - mu) * tf.math.rsqrt(var + 1e-3) * P["g"] + P["b2"]
        ai = tf.reshape(o, [-1, f * u])
        deep = tf.reshape(x, [-1, f * d])
        for i in range(len(MLP)):
            deep = tf.nn.relu(tf.matmul(deep, P[f"mw{i}"]) + P[f"mb{i}"])
        out = tf.sigmoid(tf.matmul(tf.concat([deep, ai], 1), P["ow"])
                         + P["ob"])
        return tf.clip_by_value(out, 1e-6, 1.0)

    @tf.function
    def grads_fn(ids, mask, y):
        with tf.GradientTape() as tape:
            p = forward(ids, mask, True)
            loss = tf.reduce_mean(tf.reduce_sum(
                - y * tf.math.log(p + 1e-6)
                - (1 - y) * tf.math.log(1 - p + 1e-6), axis=1))
        return loss, tape.gradient(loss, dense_vars + tables)

    b1, b2e, eps = 0.9, 0.999, 1e-8
    for _ in range(EPOCHS):
        for _, ids, mask, y in train_b:
            loss, grads = grads_fn(tf.constant(ids), tf.constant(mask),
                                   tf.constant(y))
            opt.apply_gradients(zip(grads[:len(dense_vars)], dense_vars))
            for i, g in enumerate(grads[len(dense_vars):]):
                if isinstance(g, tf.IndexedSlices):
                    g = tf.convert_to_tensor(g)
                g = g.numpy()
                cnt = np.zeros(BUCKET, np.float32)
                np.add.at(cnt, ids[i].reshape(-1), mask[i].reshape(-1))
                tch = cnt > 0
                t_s[i][tch] += 1.0
                m_s[i][tch] = b1 * m_s[i][tch] + (1 - b1) * g[tch]
                v_s[i][tch] = b2e * v_s[i][tch] + (1 - b2e) * np.square(g[tch])
                ts = np.maximum(t_s[i][tch], 1.0)
                new = tables[i].numpy()
                new[tch] -= LR_SPARSE * (m_s[i][tch] / (1 - b1 ** ts)) / (
                    np.sqrt(v_s[i][tch] / (1 - b2e ** ts)) + eps)
                tables[i].assign(new)
    ps, ys = [], []
    for _, ids, mask, y in test_b:
        ps.append(forward(tf.constant(ids), tf.constant(mask),
                          False).numpy().ravel())
        ys.append(y.ravel())
    return auc_logloss(np.concatenate(ys), np.concatenate(ps))


def main():
    train_path, test_path = "/tmp/criteo_train.tsv", "/tmp/criteo_test.tsv"
    if not os.path.exists(train_path):
        write_synthetic_criteo(train_path, N_TRAIN, seed=0)
        write_synthetic_criteo(test_path, N_TEST, seed=99)
    emb = criteo_autoint(dim=DIM, bucket_size=BUCKET).embedding
    train_b = load_batches(train_path, emb)
    test_b = load_batches(test_path, emb)
    print(f"{len(train_b)} train batches x {EPOCHS} epochs, "
          f"{len(test_b)} test batches", flush=True)

    results = {"jax": [], "tf": []}
    for seed in SEEDS:
        auc, ll = run_jax(train_b, test_b, seed)
        results["jax"].append({"seed": seed, "auc": auc, "logloss": ll})
        print(f"jax seed {seed}: AUC {auc:.4f}  logloss {ll:.4f}", flush=True)
    for seed in SEEDS:
        auc, ll = run_tf(train_b, test_b, seed)
        results["tf"].append({"seed": seed, "auc": auc, "logloss": ll})
        print(f"tf  seed {seed}: AUC {auc:.4f}  logloss {ll:.4f}", flush=True)

    summary = {}
    for side in ("jax", "tf"):
        aucs = [r["auc"] for r in results[side]]
        lls = [r["logloss"] for r in results[side]]
        summary[side] = {"auc_mean": float(np.mean(aucs)),
                         "auc_std": float(np.std(aucs)),
                         "logloss_mean": float(np.mean(lls)),
                         "logloss_std": float(np.std(lls))}
    summary["auc_delta"] = summary["jax"]["auc_mean"] - summary["tf"]["auc_mean"]
    summary["logloss_delta"] = (summary["jax"]["logloss_mean"]
                                - summary["tf"]["logloss_mean"])
    out = {"config": {"n_train": N_TRAIN, "n_test": N_TEST, "batch": BATCH,
                      "epochs": EPOCHS, "bucket": BUCKET,
                      "lr_sparse": LR_SPARSE, "lr_dense": LR_DENSE,
                      "graph": "autoint 39-slot criteo, d=8, u=8, h=2, "
                               "mlp(32,16), dropout 0.2"},
           "runs": results, "summary": summary}
    with open(os.path.join(REPO, "AUC_PARITY.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
