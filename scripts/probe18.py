"""Model-block probe: autoint attention variants, fwd+bwd at B=64k.

Variants: current _xla_iteration; no-dropout; batch-minor attention
(contractions arranged (h, dh, f, B) so every attention op keeps B on
lanes); bf16 attention compute.  Full packed step first as calibration.
"""
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
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.standard_normal((B, F, D)) * 0.3,
                               jnp.float32))
P = {k: jax.device_put(jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32))
     for k, s in [("wq", (D, U)), ("bq", (U,)), ("wk", (D, U)), ("bk", (U,)),
                  ("wv", (D, U)), ("bv", (U,)), ("wr", (D, U)), ("br", (U,)),
                  ("gamma", (U,)), ("beta", (U,))]}
key = jax.random.PRNGKey(7)
jax.block_until_ready((x, list(P.values())))
RATE = 0.2

def iter_cur(x, p, dropout_key=None):
    b, f, _ = x.shape
    flat = x.reshape(b * f, -1)
    q = jax.nn.relu(flat @ p["wq"] + p["bq"]).reshape(b, f, U)
    k = jax.nn.relu(flat @ p["wk"] + p["bk"]).reshape(b, f, U)
    v = jax.nn.relu(flat @ p["wv"] + p["bv"]).reshape(b, f, U)
    r = jax.nn.relu(flat @ p["wr"] + p["br"]).reshape(b, f, U)
    def heads(t):
        return t.reshape(b, f, H, DH).transpose(0, 2, 1, 3)
    w = jnp.einsum("bhfd,bhgd->bhfg", heads(q), heads(k),
                   preferred_element_type=jnp.float32) / (DH ** 0.5)
    w = jax.nn.softmax(w, axis=-1)
    if dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1 - RATE, w.shape)
        w = jnp.where(keep, w / (1 - RATE), 0)
    o = jnp.einsum("bhfg,bhgd->bhfd", w, heads(v),
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(b, f, U)
    o = jax.nn.relu(o + r)
    mu = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=-1, keepdims=True)
    return (o - mu) * jax.lax.rsqrt(var + 1e-3) * p["gamma"] + p["beta"]

def iter_bminor(x, p, dropout_key=None):
    b, f, _ = x.shape
    flat = x.reshape(b * f, -1)
    q = jax.nn.relu(flat @ p["wq"] + p["bq"])
    k = jax.nn.relu(flat @ p["wk"] + p["bk"])
    v = jax.nn.relu(flat @ p["wv"] + p["bv"])
    r = jax.nn.relu(flat @ p["wr"] + p["br"]).reshape(b, f, U)
    def headsT(t):                         # (h, dh, f, b)
        return t.reshape(b, f, H, DH).transpose(2, 3, 1, 0)
    qT, kT, vT = headsT(q), headsT(k), headsT(v)
    w = (qT[:, :, :, None, :] * kT[:, :, None, :, :]).sum(1) / (DH ** 0.5)
    w = jax.nn.softmax(w, axis=2)          # (h, f, g, b), keys on axis 2
    if dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1 - RATE, w.shape)
        w = jnp.where(keep, w / (1 - RATE), 0)
    o = (w[:, None, :, :, :] * vT[:, :, None, :, :]).sum(3)   # (h, dh, f, b)
    o = o.transpose(3, 2, 0, 1).reshape(b, f, U)
    o = jax.nn.relu(o + r)
    mu = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=-1, keepdims=True)
    return (o - mu) * jax.lax.rsqrt(var + 1e-3) * p["gamma"] + p["beta"]

def fwdbwd(iter_fn, with_dropout):
    def loss(x_, p_):
        out = x_
        for i in range(3):
            dk = jax.random.fold_in(key, i) if with_dropout else None
            out = iter_fn(out, p_, dk)
        return jnp.sum(out * out)
    @jax.jit
    def f(x_, p_):
        l, (dx, dp) = jax.value_and_grad(loss, (0, 1))(x_, p_)
        return l
    return f

timeit("A. current attn, 3 layers, dropout, fwd+bwd", fwdbwd(iter_cur, True), x, P)
timeit("B. current attn, NO dropout, fwd+bwd", fwdbwd(iter_cur, False), x, P)
timeit("C. b-minor attn, dropout, fwd+bwd", fwdbwd(iter_bminor, True), x, P)
timeit("D. b-minor attn, NO dropout, fwd+bwd", fwdbwd(iter_bminor, False), x, P)

a = jax.jit(lambda x_, p_: iter_cur(x_, p_, None))(x, P)
c = jax.jit(lambda x_, p_: iter_bminor(x_, p_, None))(x, P)
print("cur-vs-bminor parity:", float(jnp.max(jnp.abs(a - c))), flush=True)
