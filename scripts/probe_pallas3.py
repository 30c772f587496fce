"""Scale throughput of per-id-loop Pallas kernels on packed (R/16,128) tables.

scatter: grid (chunks,), acc block resident, ids chunk in SMEM,
         pre-laned g128 chunk in VMEM; per id: acc[phys] += g128[j].
gather:  per id: out[j] = table[phys].
Also: one-hot MXU accumulate on sorted ids (tile sweep, static blocks).
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

R = 265_008          # rows, padded to /16
D = 8
P = 16               # logical rows per physical row
RP = R // P          # 16563 physical rows
E = 327_680          # ids per table
C = 4096             # ids per grid chunk

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=5):
    out = fn(*args); fetch(out)
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter() - t0) / n
    ns = dt / E * 1e9
    print(f"{name:40s} {dt*1e3:9.2f} ms  ({ns:6.2f} ns/id) ({f:.4g})", flush=True)
    return dt

key = jax.random.PRNGKey(0)
ids = jax.random.randint(key, (E,), 0, R, jnp.int32)
phys = ids // P
lane = ids % P
g = jax.random.normal(key, (E, D), jnp.float32)
# pre-laned gradient rows: g128[j, lane*8:(lane+1)*8] = g[j]
oh = jax.nn.one_hot(lane, P, dtype=jnp.float32)          # (E, 16)
g128 = (oh[:, :, None] * g[:, None, :]).reshape(E, P * D)
tab = jax.random.normal(key, (RP, P * D), jnp.float32)
jax.block_until_ready((phys, g128, tab))

# ---- scatter RMW ----
def sc_kernel(p_ref, g_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    def body(j, _):
        acc_ref[pl.ds(p_ref[j], 1), :] += g_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, C, body, 0)

@jax.jit
def scatter(p, gg):
    return pl.pallas_call(
        sc_kernel, grid=(E // C,),
        in_specs=[pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.SMEM),
                  pl.BlockSpec((C, P * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RP, P * D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RP, P * D), jnp.float32),
    )(p, gg)

timeit("pallas scatter RMW packed", lambda p, gg: scatter(p, gg)[0, 0], phys, g128)

# correctness
acc = np.zeros((RP, P * D), np.float32)
np.add.at(acc, np.asarray(phys), np.asarray(g128))
got = np.asarray(scatter(phys, g128))
print("scatter match:", np.allclose(acc, got, atol=1e-4), flush=True)

# ---- gather loop ----
def ga_kernel(p_ref, t_ref, o_ref):
    def body(j, _):
        o_ref[pl.ds(j, 1), :] = t_ref[pl.ds(p_ref[j], 1), :]
        return 0
    jax.lax.fori_loop(0, C, body, 0)

@jax.jit
def gather(p, t):
    return pl.pallas_call(
        ga_kernel, grid=(E // C,),
        in_specs=[pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.SMEM),
                  pl.BlockSpec((RP, P * D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, P * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, P * D), jnp.float32),
    )(p, t)

timeit("pallas gather loop packed", lambda p, t: gather(p, t)[0, 0], phys, tab)
ref = np.asarray(tab)[np.asarray(phys)]
print("gather match:", np.allclose(ref, np.asarray(gather(phys, tab))), flush=True)

# XLA comparison at same scale, true (R, 8) layout
tab8 = jax.random.normal(key, (R, D), jnp.float32)
f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
timeit("XLA take (R,8)", f_take, tab8, ids)
f_scat = jax.jit(lambda i, gg: jnp.zeros((R, D), jnp.float32).at[i].add(gg)[0, 0])
timeit("XLA scatter-add (R,8)", f_scat, ids, g)

# lane-prep cost in XLA (g -> g128) and post-compact (out128 -> (E,8))
f_prep = jax.jit(lambda lane_, g_: (jax.nn.one_hot(lane_, P, dtype=jnp.float32)[:, :, None]
                                    * g_[:, None, :]).reshape(E, P * D).sum())
timeit("XLA lane-prep g->g128", f_prep, lane, g)
out128 = gather(phys, tab)
f_post = jax.jit(lambda o, lane_: jnp.sum(
    (o.reshape(E, P, D) * jax.nn.one_hot(lane_, P, dtype=jnp.float32)[:, :, None]).sum(1)))
timeit("XLA post-compact out128->(E,8)", f_post, out128, lane)
