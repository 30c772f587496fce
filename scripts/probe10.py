"""Fold/unfold kernel variants at headline shapes: block-size scan + an
all-L-in-one-grid-step variant (3-D blocks over an (L, X, 128) view)."""
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

from recommendsystem_tpu.embedding import packed as pk
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

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

D, L = 8, 5
E = 1310720
X = E // L
key = jax.random.PRNGKey(0)
ids = jax.random.randint(key, (E,), 0, 1_000_000, jnp.int32)
mask = (jax.random.uniform(key, (E,)) > 0.3).astype(jnp.float32)
ohm = jax.jit(lambda i, m: pk.build_ohm(i, m, D))(ids, mask)
wide = jax.random.normal(key, (E, 128), jnp.float32)
gx = jax.random.normal(key, (X, D), jnp.float32)
jax.block_until_ready((ohm, wide, gx))

FOLD = pk.fold_matrix(D)
SFT = pk.scatter_fold_matrix(D).T

# reference result for parity
ref = np.asarray(jax.jit(lambda w, o: pk.fold_mean_ref(w, o, L, D))(wide, ohm))

def fold_cx(cx):
    nb = X // cx
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
            out_shape=jax.ShapeDtypeStruct((X, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((cx, 128), jnp.float32)],
        )(w_, o_, FOLD)
    return run

for cx in (256, 512, 1024, 2048):
    if X % cx == 0:
        r = fold_cx(cx)
        timeit(f"fold grid(nb,L) cx={cx}", lambda w, o: r(w, o).sum(), wide, ohm)
        if cx == 1024:
            print("  parity:", np.allclose(np.asarray(r(wide, ohm)), ref, atol=1e-4), flush=True)

def fold_3d(cx):
    nb = X // cx
    def kernel(w_ref, o_ref, f_ref, out_ref):
        m = jnp.where((o_ref[:] & 1) != 0, w_ref[:], 0.0)   # (L, cx, 128)
        s = m.sum(axis=0)
        out_ref[:] = jnp.dot(s, f_ref[:], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    @jax.jit
    def run(w_, o_):
        w3 = w_.reshape(L, X, 128)
        o3 = o_.reshape(L, X, 128)
        return pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=[pl.BlockSpec((L, cx, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((L, cx, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, D), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((cx, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((X, D), jnp.float32),
        )(w3, o3, FOLD)
    return run

for cx in (256, 512, 1024):
    if X % cx == 0:
        try:
            r = fold_3d(cx)
            timeit(f"fold 3D-block cx={cx}", lambda w, o: r(w, o).sum(), wide, ohm)
            if cx == 1024:
                print("  parity:", np.allclose(np.asarray(r(wide, ohm)), ref, atol=1e-4), flush=True)
        except Exception as ex:
            print(f"fold 3D cx={cx} failed: {type(ex).__name__}: {str(ex)[:120]}", flush=True)

refu = np.asarray(jax.jit(lambda g, o: pk.unfold_mean_ref(g, o, L))(gx, ohm))

def unfold_cx(cx):
    nb = X // cx
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
            out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
        )(g_, o_, SFT)
    return run

for cx in (256, 512, 1024, 2048):
    if X % cx == 0:
        r = unfold_cx(cx)
        timeit(f"unfold grid(nb,L) cx={cx}", lambda g, o: r(g, o)[0, 0], gx, ohm)
        if cx == 1024:
            print("  parity:", np.allclose(np.asarray(r(gx, ohm)), refu, atol=1e-4), flush=True)

def unfold_3d(cx):
    nb = X // cx
    def kernel(g_ref, o_ref, f_ref, out_ref):
        gw = jnp.dot(g_ref[:], f_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)   # (cx, 128)
        o = o_ref[:].astype(jnp.int32)                       # (L, cx, 128)
        out_ref[:] = (gw[None] * ((o >> 1) & 1).astype(jnp.float32)
                      + ((o >> 2) & 1).astype(jnp.float32))
    @jax.jit
    def run(g_, o_):
        o3 = o_.reshape(L, X, 128)
        out = pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=[pl.BlockSpec((cx, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((L, cx, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((D, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((L, cx, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, X, 128), jnp.float32),
        )(g_, o3, SFT)
        return out.reshape(E, 128)
    return run

for cx in (256, 512, 1024):
    if X % cx == 0:
        try:
            r = unfold_3d(cx)
            timeit(f"unfold 3D-block cx={cx}", lambda g, o: r(g, o)[0, 0], gx, ohm)
            if cx == 1024:
                print("  parity:", np.allclose(np.asarray(r(gx, ohm)), refu, atol=1e-4), flush=True)
        except Exception as ex:
            print(f"unfold 3D cx={cx} failed: {type(ex).__name__}: {str(ex)[:120]}", flush=True)
