"""Probe: scatter-add variants + fold/unfold block sizes at headline shapes.

A: current per-table scatter with span concats (4 tables x concat + scatter)
B: ONE storage-wide scatter, phys = ids // ps (no concats; valid because the
   member stride is an exact multiple of ps)
C: per-table scatter on contiguous span views (no concat, 20 small scatters)
D: fold/unfold with budget_rows 2048 vs 4096 vs 8192
"""
# NOTE: historical measurement record of a SUPERSEDED packed-path design
# (ohm-bitmap / l-major fold helpers deleted from embedding/packed.py at
# HEAD).  Kept as documentation of the measurements that drove the from-ids
# b-major redesign; this script no longer runs.
import sys as _sys
print(__doc__)
print("HISTORICAL: this probe measured the superseded ohm-bitmap/l-major packed"
      " design; the helpers it drove were deleted from embedding/packed.py."
      " Kept as the measurement record behind the from-ids b-major redesign."
      " Exiting without running.")
_sys.exit(0)
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp

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
    print(f"{name:48s} {dt*1e3:9.1f} ms  (fetch={f:.4g})", flush=True)
    return dt

D, PS = 8, 14
NT = 4                       # tables per storage group
STRIDE = 265104              # rows per table (multiple of 14 and 16)
NP_T = STRIDE // PS          # 18936 physical payload rows per table
E = 1310720                  # stream rows per storage (B*4cols*L)
L = 5
key = jax.random.PRNGKey(0)
ids = jax.random.randint(key, (E,), 0, NT * STRIDE, jnp.int32)
pay = jax.random.normal(key, (E, 128), jnp.float32)
jax.block_until_ready((ids, pay))

# spans: per table, L spans of width E/(NT*L), table-major within l
W = E // (NT * L)
spans = {t: [(l * (E // L) + t * W, W) for l in range(L)] for t in range(NT)}

@jax.jit
def scat_A(ids_, pay_):
    tot = jnp.float32(0)
    for t in range(NT):
        t_ids = jnp.concatenate([ids_[s:s+n] for s, n in spans[t]])
        t_pay = jnp.concatenate([pay_[s:s+n] for s, n in spans[t]])
        phys = (t_ids - t * STRIDE) // PS
        acc = jnp.zeros((NP_T, 128), jnp.float32).at[phys].add(t_pay, mode="drop")
        tot += acc[0, 0]
    return tot
timeit("A per-table scatter + span concats", scat_A, ids, pay)

@jax.jit
def scat_B(ids_, pay_):
    phys = ids_ // PS
    acc = jnp.zeros((NT * NP_T, 128), jnp.float32).at[phys].add(pay_, mode="drop")
    return acc[0, 0]
timeit("B storage-wide single scatter", scat_B, ids, pay)

@jax.jit
def scat_C(ids_, pay_):
    tot = jnp.float32(0)
    for t in range(NT):
        acc = jnp.zeros((NP_T, 128), jnp.float32)
        for s, n in spans[t]:
            phys = (ids_[s:s+n] - t * STRIDE) // PS
            acc = acc.at[phys].add(pay_[s:s+n], mode="drop")
        tot += acc[0, 0]
    return tot
timeit("C per-table scatter on span views", scat_C, ids, pay)

# numerics: B == A
a = jax.jit(lambda i, p: jnp.concatenate(
    [jnp.zeros((NP_T, 128), jnp.float32).at[(jnp.concatenate([i[s:s+n] for s, n in spans[t]]) - t*STRIDE)//PS].add(
        jnp.concatenate([p[s:s+n] for s, n in spans[t]]), mode="drop") for t in range(NT)]))(ids, pay)
b = jax.jit(lambda i, p: jnp.zeros((NT*NP_T, 128), jnp.float32).at[i//PS].add(p, mode="drop"))(ids, pay)
import numpy as np
print("B == A:", np.allclose(np.asarray(a), np.asarray(b)), flush=True)

# sorted-indices scatter (host-sorted perm shipped with the batch)
perm = jnp.argsort(ids)
ids_s = ids[perm]
jax.block_until_ready((perm, ids_s))
@jax.jit
def scat_S(ids_sorted, perm_, pay_):
    ps = jnp.take(pay_, perm_, axis=0)
    phys = ids_sorted // PS
    acc = jnp.zeros((NT * NP_T, 128), jnp.float32).at[phys].add(
        ps, mode="drop", indices_are_sorted=True)
    return acc[0, 0]
timeit("S take(perm) + sorted scatter", scat_S, ids_s, perm, pay)

@jax.jit
def scat_S2(ids_sorted, pay_):
    phys = ids_sorted // PS
    acc = jnp.zeros((NT * NP_T, 128), jnp.float32).at[phys].add(
        pay_, mode="drop", indices_are_sorted=True)
    return acc[0, 0]
timeit("S2 sorted scatter alone (no perm-take)", scat_S2, ids_s, pay)

# ---- fold/unfold block-size scan ----
from recommendsystem_tpu.embedding import packed as pk
ohm = jax.jit(lambda i, m: pk.build_ohm(i, m, D))(
    ids, (jax.random.uniform(key, (E,)) > 0.3).astype(jnp.float32))
wide = jax.random.normal(key, (E, 128), jnp.float32)
gx = jax.random.normal(key, (E // L, D), jnp.float32)
jax.block_until_ready((ohm, wide, gx))

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

def fold_cx(cx):
    x = E // L
    nb = x // cx
    fold = pk.fold_matrix(D)
    def kernel(w_ref, o_ref, f_ref, out_ref, acc):
        li = pl.program_id(1)
        m = jnp.where((o_ref[:] & 1) != 0, w_ref[:], 0.0)
        @pl.when(li == 0)
        def _(): acc[:] = m
        @pl.when(li > 0)
        def _(): acc[:] += m
        @pl.when(li == L - 1)
        def _(): out_ref[:] = jnp.dot(acc[:], f_ref[:],
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)
    @jax.jit
    def run(w_, o_):
        return pl.pallas_call(
            kernel, grid=(nb, L),
            in_specs=[pl.BlockSpec((cx, 128), lambda i, li: (li*nb+i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((cx, 128), lambda i, li: (li*nb+i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, D), lambda i, li: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((cx, D), lambda i, li: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((cx, 128), jnp.float32)],
        )(w_, o_).sum()
    return run

for cx in (1024, 2048, 4096, 8192):
    if (E // L) % cx == 0:
        timeit(f"fold cx={cx}", fold_cx(cx), wide, ohm)

def unfold_cx(cx):
    x = E // L
    nb = x // cx
    foldt = pk.scatter_fold_matrix(D).T
    def kernel(g_ref, o_ref, f_ref, out_ref):
        gw = jnp.dot(g_ref[:], f_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        o = o_ref[:].astype(jnp.int32)
        out_ref[:] = (gw * ((o >> 1) & 1).astype(jnp.float32)
                      + ((o >> 2) & 1).astype(jnp.float32))
    @jax.jit
    def run(g_, o_):
        return pl.pallas_call(
            kernel, grid=(nb, L),
            in_specs=[pl.BlockSpec((cx, D), lambda i, li: (i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((cx, 128), lambda i, li: (li*nb+i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((D, 128), lambda i, li: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((cx, 128), lambda i, li: (li*nb+i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x * L, 128), jnp.float32),
        )(g_, o_)[0, 0]
    return run

for cx in (1024, 2048, 4096, 8192):
    if (E // L) % cx == 0:
        timeit(f"unfold cx={cx}", unfold_cx(cx), gx, ohm)
