"""Decide the backward design: unrolled pallas loops vs per-table XLA scatter
vs sort+payload, at headline scale (24 tables x 327k ids)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

R, D, P = 265_008, 8, 16
RP = R // P
NT = 24
E = 327_680            # per table
ET = NT * E            # 7.9M total
C = 4096

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=3, per=ET):
    out = fn(*args); fetch(out)
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.2f} ms  ({dt/per*1e9:6.2f} ns/id) ({f:.4g})",
          flush=True)
    return dt

key = jax.random.PRNGKey(0)
ids24 = jax.random.randint(key, (NT, E), 0, R, jnp.int32)
g24 = jax.random.normal(key, (NT, E, D), jnp.float32)
phys = ids24[0] // P
g128 = jax.random.normal(key, (E, P * D), jnp.float32)
tabp = jax.random.normal(key, (RP, P * D), jnp.float32)
jax.block_until_ready((ids24, g24, phys, g128, tabp))

# A) 24 per-table XLA scatter-adds in one jit
@jax.jit
def xla_per_table(idv, gg):
    outs = []
    for t in range(NT):
        outs.append(jnp.zeros((R, D), jnp.float32).at[idv[t]].add(gg[t]))
    return jnp.stack(outs)[0, 0, 0]
timeit("XLA 24x per-table scatter-add", xla_per_table, ids24, g24)

# B) unrolled pallas RMW (U ids per loop iter)
def make_sc(U):
    def k(p_ref, g_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        def body(j, _):
            base = j * U
            for u in range(U):
                acc_ref[pl.ds(p_ref[base + u], 1), :] += g_ref[pl.ds(base + u, 1), :]
            return 0
        jax.lax.fori_loop(0, C // U, body, 0)
    @jax.jit
    def f(p, gg):
        return pl.pallas_call(
            k, grid=(E // C,),
            in_specs=[pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.SMEM),
                      pl.BlockSpec((C, P * D), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((RP, P * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((RP, P * D), jnp.float32),
        )(p, gg)
    return f
for U in (4, 8):
    timeit(f"pallas RMW unroll{U} (1 table)", lambda p, g, U=U: make_sc(U)(p, g)[0, 0],
           phys, g128, per=E)

# C) unrolled pallas gather
def make_ga(U):
    def k(p_ref, t_ref, o_ref):
        def body(j, _):
            base = j * U
            for u in range(U):
                o_ref[pl.ds(base + u, 1), :] = t_ref[pl.ds(p_ref[base + u], 1), :]
            return 0
        jax.lax.fori_loop(0, C // U, body, 0)
    @jax.jit
    def f(p, t):
        return pl.pallas_call(
            k, grid=(E // C,),
            in_specs=[pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.SMEM),
                      pl.BlockSpec((RP, P * D), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((C, P * D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, P * D), jnp.float32),
        )(p, t)
    return f
for U in (4, 8):
    timeit(f"pallas gather unroll{U} (1 table)", lambda p, t, U=U: make_ga(U)(p, t)[0, 0],
           phys, tabp, per=E)

# D) variadic sort with 8-col f32 payload + mask at 7.9M
flat_ids = ids24.reshape(-1)
flat_g = g24.reshape(-1, D)
@jax.jit
def sort_payload(i, gg):
    ops = (i,) + tuple(gg[:, d] for d in range(D))
    out = jax.lax.sort(ops, num_keys=1)
    return out[0][-1] + out[1][-1]
timeit("XLA sort 7.9M ids + 8-col payload", sort_payload, flat_ids, flat_g)

# E) cumsum of (7.9M, 8)
@jax.jit
def cum(gg):
    return jnp.cumsum(gg, axis=0)[-1, 0]
timeit("XLA cumsum (7.9M,8) axis0", cum, flat_g)

# F) XLA take from packed (RP,128) with 7.9M phys ids (wide-row take)
bigphys = jax.random.randint(key, (ET,), 0, RP, jnp.int32)
f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
timeit("XLA take (RP,128) 7.9M", f_take, tabp, bigphys)
