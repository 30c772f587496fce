"""Fully-transposed InteractingLayer iteration: keep (u, f, B) batch-minor
layout END-TO-END (projections as (u,d)@(d, f*B) matmuls, LN over leading
dims), transposing only at entry/exit of the whole stack — vs the current
per-iteration heads_t transposes.  Same-process A/B with calibration."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=3):
    out = fn(*args); fetch(out)
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter()-t0)/n
    print(f"{name:56s} {dt*1e3:9.2f} ms  (fetch={f:.5g})", flush=True)
    return dt

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step
bundle = create_model("autoint", bucket_size=265000)
batch, dense, labels, weight = synthetic_batch(bundle, 65536, seed=0,
                                               ids_per_feature=5)
batch = jax.device_put(batch); labels = jax.device_put(labels)
weight = jax.device_put(weight)
state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
rng_ = jax.random.PRNGKey(1)
step = make_train_step(bundle, donate=False, sparse_update="packed")
timeit("FULL packed step (calibration)", lambda: step(
    state, batch, labels, weight, None, rng_)[1]["loss"])

B, F, D = 65536, 24, 8
U, H = 8, 2
DH = U // H
LN_EPS = 1e-3
RATE = 0.2
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.standard_normal((B, F, D)) * 0.3,
                               jnp.float32))
P = {k: jax.device_put(jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32))
     for k, s in [("wq", (D, U)), ("bq", (U,)), ("wk", (D, U)), ("bk", (U,)),
                  ("wv", (D, U)), ("bv", (U,)), ("wr", (D, U)), ("br", (U,)),
                  ("gamma", (U,)), ("beta", (U,))]}
key = jax.random.PRNGKey(7)
jax.block_until_ready((x, list(P.values())))

# current (HEAD) b-minor iteration
def iter_cur(x, p, dropout_key=None):
    b, f, _ = x.shape
    flat = x.reshape(b * f, -1)
    q = jax.nn.relu(flat @ p["wq"] + p["bq"])
    k = jax.nn.relu(flat @ p["wk"] + p["bk"])
    v = jax.nn.relu(flat @ p["wv"] + p["bv"])
    r = jax.nn.relu(flat @ p["wr"] + p["br"]).reshape(b, f, U)
    def heads_t(t):
        return t.reshape(b, f, H, DH).transpose(2, 3, 1, 0)
    qt, kt, vt = heads_t(q), heads_t(k), heads_t(v)
    w = (qt[:, :, :, None, :] * kt[:, :, None, :, :]).sum(1) / (DH ** 0.5)
    w = jax.nn.softmax(w, axis=2)
    if dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1 - RATE, w.shape)
        w = jnp.where(keep, w / (1 - RATE), 0)
    o = (w[:, None, :, :, :] * vt[:, :, None, :, :]).sum(3)
    o = o.transpose(3, 2, 0, 1).reshape(b, f, U)
    o = jax.nn.relu(o + r)
    mu = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=-1, keepdims=True)
    return (o - mu) * jax.lax.rsqrt(var + LN_EPS) * p["gamma"] + p["beta"]

# fully-transposed: x_t is (d, f, B); everything stays batch-minor
def iter_T(x_t, p, dropout_key=None):
    d, f, b = x_t.shape
    flat = x_t.reshape(d, f * b)
    def proj(wkey, bkey):                       # (U, f*B) -> (H, DH, f, B)
        z = jax.nn.relu(p[wkey].T @ flat + p[bkey][:, None])
        return z.reshape(H, DH, f, b)
    qt, kt, vt = proj("wq", "bq"), proj("wk", "bk"), proj("wv", "bv")
    rt = jax.nn.relu(p["wr"].T @ flat + p["br"][:, None]).reshape(U, f, b)
    w = (qt[:, :, :, None, :] * kt[:, :, None, :, :]).sum(1) / (DH ** 0.5)
    w = jax.nn.softmax(w, axis=2)               # (H, f, g, B)
    if dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1 - RATE, w.shape)
        w = jnp.where(keep, w / (1 - RATE), 0)
    o = (w[:, None, :, :, :] * vt[:, :, None, :, :]).sum(3)   # (H, DH, f, B)
    o = jax.nn.relu(o.reshape(U, f, b) + rt)
    mu = jnp.mean(o, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=0, keepdims=True)
    return ((o - mu) * jax.lax.rsqrt(var + LN_EPS)
            * p["gamma"][:, None, None] + p["beta"][:, None, None])

def fwdbwd_cur(with_dropout):
    def loss(x_, p_):
        out = x_
        for i in range(3):
            dk = jax.random.fold_in(key, i) if with_dropout else None
            out = iter_cur(out, p_, dk)
        return jnp.sum(out * out)
    return jax.jit(lambda x_, p_: jax.value_and_grad(loss, (0, 1))(x_, p_)[0])

def fwdbwd_T(with_dropout):
    def loss(x_, p_):
        out = x_.transpose(2, 1, 0)             # ONE entry transpose
        for i in range(3):
            dk = jax.random.fold_in(key, i) if with_dropout else None
            out = iter_T(out, p_, dk)
        out = out.transpose(2, 1, 0)            # ONE exit transpose
        return jnp.sum(out * out)
    return jax.jit(lambda x_, p_: jax.value_and_grad(loss, (0, 1))(x_, p_)[0])

timeit("A. HEAD b-minor, dropout, 3-iter fwd+bwd", fwdbwd_cur(True), x, P)
timeit("B. fully-transposed, dropout, 3-iter fwd+bwd", fwdbwd_T(True), x, P)
timeit("C. HEAD b-minor, no dropout", fwdbwd_cur(False), x, P)
timeit("D. fully-transposed, no dropout", fwdbwd_T(False), x, P)

a = jax.jit(lambda x_, p_: iter_cur(x_, p_, None))(x, P)
t = jax.jit(lambda x_, p_: iter_T(x_.transpose(2, 1, 0), p_,
                                  None).transpose(2, 1, 0))(x, P)
print("parity cur-vs-T:", float(jnp.max(jnp.abs(a - t))), flush=True)
