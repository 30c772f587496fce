"""Probe Mosaic capabilities + throughput for embedding-style kernels.

E1: XLA take with sorted vs random ids (locality effect)
E2: Pallas whole-table-in-VMEM gather via jnp.take inside kernel
E3: Pallas per-row fori_loop gather (dynamic slice)
E4: Pallas per-row RMW accumulate (scatter-add analog)
E5: one-hot matmul accumulate (sorted chunks into row tiles)
"""
import os, sys, time, functools
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

R = 265_000          # rows per table (autoint bench)
D = 8
E = 327_680          # ids per table per step (65536 * 5)
NT = 24              # tables

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=5):
    try:
        out = fn(*args); fetch(out)
        out = fn(*args); fetch(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        f = fetch(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:44s} {dt*1e3:9.2f} ms ({f:.4g})", flush=True)
        return dt
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (R, D), jnp.float32)
ids = jax.random.randint(key, (E,), 0, R, jnp.int32)
ids_sorted = jnp.sort(ids)
grads = jax.random.normal(key, (E, D), jnp.float32)
big_ids = jax.random.randint(key, (NT * E,), 0, R, jnp.int32)  # 7.9M
jax.block_until_ready((table, ids, ids_sorted, grads, big_ids))

# ---- E1: XLA take, random vs sorted; per-table vs fused scale ----
f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
timeit("XLA take 327k random (1 table)", f_take, table, ids)
timeit("XLA take 327k sorted", f_take, table, ids_sorted)
timeit("XLA take 7.9M random (same table)", f_take, table, big_ids)

# ---- E2: Pallas whole-table VMEM gather, jnp.take inside ----
CH = 8192
def g2_kernel(tab_ref, ids_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], ids_ref[:], axis=0)

@jax.jit
def g2(tab, idv):
    return pl.pallas_call(
        g2_kernel,
        grid=(E // CH,),
        in_specs=[pl.BlockSpec((R, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CH, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
    )(tab, idv)
timeit("Pallas VMEM take (whole table res.)", lambda t, i: g2(t, i).sum(), table, ids)

# ---- E3: Pallas per-row loop gather ----
def g3_kernel(tab_ref, ids_ref, out_ref):
    def body(j, _):
        out_ref[pl.ds(j, 1), :] = tab_ref[pl.ds(ids_ref[j], 1), :]
        return 0
    jax.lax.fori_loop(0, CH, body, 0)

@jax.jit
def g3(tab, idv):
    return pl.pallas_call(
        g3_kernel,
        grid=(E // CH,),
        in_specs=[pl.BlockSpec((R, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((CH, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
    )(tab, idv)
timeit("Pallas per-row loop gather", lambda t, i: g3(t, i).sum(), table, ids)

# ---- E4: Pallas per-row RMW accumulate into whole-table VMEM acc ----
def s4_kernel(ids_ref, g_ref, acc_ref):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    def body(j, _):
        r = ids_ref[j]
        acc_ref[pl.ds(r, 1), :] += g_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, CH, body, 0)

@jax.jit
def s4(idv, g):
    return pl.pallas_call(
        s4_kernel,
        grid=(E // CH,),
        in_specs=[pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
                  pl.BlockSpec((CH, D), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
    )(idv, g)
timeit("Pallas per-row RMW accumulate", lambda i, g: s4(i, g)[0, 0], ids, grads)

# ---- E5: one-hot matmul accumulate over sorted chunks ----
TR = 512   # row-tile
C = 512    # ids per chunk
srt = jnp.sort(ids)
starts = jnp.searchsorted(srt, jnp.arange(0, R + TR, TR, dtype=jnp.int32)).astype(jnp.int32)
g_sorted = jnp.take(grads, jnp.argsort(ids), axis=0)
jax.block_until_ready((srt, starts, g_sorted))

def s5_kernel(starts_ref, ids_hbm, g_hbm, acc_ref, idbuf, gbuf, sem1, sem2):
    t = pl.program_id(0)
    lo = starts_ref[t]
    hi = starts_ref[t + 1]
    base = t * TR
    nch = (hi - lo + C - 1) // C

    def chunk(ci, _):
        off = lo + ci * C
        cp1 = pltpu.make_async_copy(ids_hbm.at[pl.ds(off, C)], idbuf, sem1)
        cp2 = pltpu.make_async_copy(g_hbm.at[pl.ds(off, C), :], gbuf, sem2)
        cp1.start(); cp2.start(); cp1.wait(); cp2.wait()
        rel = idbuf[:] - base                                   # (C,)
        valid = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]
                 + ci * C + lo) < hi
        onehot = (rel[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (C, TR), 1)) & valid[:, None]
        acc_ref[:] += jax.lax.dot_general(
            onehot.astype(jnp.float32), gbuf[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0
    @pl.when(nch > 0)
    def _():
        jax.lax.fori_loop(0, nch, chunk, 0)

@jax.jit
def s5(st, idv, g):
    grid = (R // TR + 1,)
    return pl.pallas_call(
        s5_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((TR, D), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R // TR * TR + TR, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C,), jnp.int32),
                        pltpu.VMEM((C, D), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )(st, idv, g)
timeit("Pallas sorted one-hot accumulate", lambda s, i, g: s5(s, i, g)[0, 0],
       starts, srt, g_sorted)

# sort cost at per-table scale
f_sort = jax.jit(lambda i: jax.lax.sort((i, jnp.arange(E, dtype=jnp.int32)),
                                        num_keys=1)[0][-1])
timeit("XLA kv-sort 327k", f_sort, ids)
