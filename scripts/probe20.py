"""Flash field-attention kernel vs XLA attention core, fwd+bwd, on chip.

Shapes: the ctr_production212 regime (H=2, dh=4, F=175, B=8192) and the
autoint headline regime (F=24, B=65536).  Same-process A/B, fetch-verified
windows (CLAUDE.md benchmarking rules).
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.kernels.field_attention_pallas import (
    field_attention, field_attention_reference, eligible)

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=5):
    out = fn(*args); fetch(out)
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter()-t0)/n
    print(f"{name:56s} {dt*1e3:9.2f} ms  (fetch={f:.5g})", flush=True)
    return dt

def xla_core(q, k, v):
    dh = q.shape[1]
    w = (q[:, :, :, None, :] * k[:, :, None, :, :]).sum(1) / (dh ** 0.5)
    w = jax.nn.softmax(w, axis=2)
    return (w[:, None, :, :, :] * v[:, :, None, :, :]).sum(3)

for (h, dh, f, b) in [(2, 4, 175, 8192), (2, 4, 24, 65536)]:
    print(f"\n== H={h} dh={dh} F={f} B={b}  eligible={eligible(h, dh, f, b)}")
    rng = np.random.default_rng(0)
    q, k, v, g = (jax.device_put(jnp.asarray(
        rng.standard_normal((h, dh, f, b)), jnp.float32)) for _ in range(4))

    fwd_x = jax.jit(xla_core)
    fwd_k = jax.jit(lambda q, k, v: field_attention(q, k, v, 0, 0.0))
    timeit("XLA core fwd", fwd_x, q, k, v)
    timeit("flash fwd", fwd_k, q, k, v)
    o_x, o_k = fwd_x(q, k, v), fwd_k(q, k, v)
    print("   fwd parity:", float(jnp.abs(o_x - o_k).max()))

    def make_fb(core):
        def loss(q, k, v):
            return jnp.sum(core(q, k, v) * g)
        vg = jax.value_and_grad(loss, argnums=(0, 1, 2))
        return jax.jit(vg)
    fb_x, fb_k = make_fb(xla_core), make_fb(lambda q, k, v: field_attention(q, k, v, 0, 0.0))
    timeit("XLA core fwd+bwd", fb_x, q, k, v)
    timeit("flash fwd+bwd", fb_k, q, k, v)
    (_, gx), (_, gk) = fb_x(q, k, v), fb_k(q, k, v)
    err = max(float(jnp.abs(a - b2).max()) for a, b2 in zip(gx, gk))
    print("   bwd parity:", err)

    # dropout on-chip: deterministic per seed, differs across seeds
    dk = jax.jit(lambda q, k, v, s: field_attention(q, k, v, s, 0.2))
    timeit("flash fwd dropout 0.2", dk, q, k, v, jnp.int32(7))
    a = dk(q, k, v, jnp.int32(7)); b2 = dk(q, k, v, jnp.int32(7))
    c = dk(q, k, v, jnp.int32(8))
    print("   same-seed max diff:", float(jnp.abs(a - b2).max()),
          " cross-seed:", float(jnp.abs(a - c).max()))
    fbd = make_fb(lambda q, k, v: field_attention(q, k, v, 7, 0.2))
    timeit("flash fwd+bwd dropout 0.2", fbd, q, k, v)
