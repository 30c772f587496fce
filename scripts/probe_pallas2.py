"""Minimal Mosaic capability bisect: which constructs compile on this toolchain."""
import os, sys, time
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

def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        out = jax.tree.leaves(out)[0]
        v = float(np.asarray(out).ravel()[0])
        print(f"{name:46s} OK ({v:.4g})", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:46s} FAIL {type(e).__name__}: {msg}", flush=True)
        return False

R, D, C = 1024, 8, 256
tab = jnp.arange(R * D, dtype=jnp.float32).reshape(R, D)
ids = jnp.arange(C, dtype=jnp.int32) * 3 % R
g = jnp.ones((C, D), jnp.float32)

# 1. SMEM input block spec (whole array)
def k1(i_ref, o_ref):
    o_ref[0, 0] = i_ref[0] * 1.0
run("SMEM whole-array input", lambda i: pl.pallas_call(
    k1, in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))(i), ids)

# 2. dynamic-index VMEM read, scalar idx from SMEM
def k2(i_ref, t_ref, o_ref):
    def body(j, _):
        o_ref[pl.ds(j, 1), :] = t_ref[pl.ds(i_ref[j], 1), :]
        return 0
    jax.lax.fori_loop(0, C, body, 0)
run("dyn VMEM read + write rows (loop)", lambda i, t: pl.pallas_call(
    k2, in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32))(i, t), ids, tab)

# 3. dynamic RMW accumulate
def k3(i_ref, g_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    def body(j, _):
        r = i_ref[j]
        o_ref[pl.ds(r, 1), :] += g_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, C, body, 0)
run("dyn VMEM RMW accumulate (loop)", lambda i, gg: pl.pallas_call(
    k3, in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32))(i, gg), ids, g)

# 4. jnp.take inside kernel (vectorized gather)
def k4(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)
run("jnp.take axis0 inside kernel (VMEM ids)", lambda t, i: pl.pallas_call(
    k4, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32))(t, i), tab, ids)

# 5. one-hot matmul gather (MXU)
def k5(t_ref, i_ref, o_ref):
    oh = (i_ref[:][:, None] == jax.lax.broadcasted_iota(jnp.int32, (C, R), 1))
    o_ref[:] = jax.lax.dot_general(oh.astype(jnp.float32), t_ref[:],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
run("one-hot matmul gather (VMEM ids)", lambda t, i: pl.pallas_call(
    k5, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32))(t, i), tab, ids)

# 6. one-hot matmul accumulate transpose (scatter analog)
def k6(i_ref, g_ref, o_ref):
    oh = (i_ref[:][:, None] == jax.lax.broadcasted_iota(jnp.int32, (C, R), 1))
    o_ref[:] = jax.lax.dot_general(oh.astype(jnp.float32), g_ref[:],
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
run("one-hot matmul scatter-acc", lambda i, gg: pl.pallas_call(
    k6, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32))(i, gg), ids, g)

# 7. HBM input + dynamic-offset DMA to VMEM scratch
def k7(h_ref, o_ref, buf, sem):
    cp = pltpu.make_async_copy(h_ref.at[pl.ds(256, C), :], buf, sem)
    cp.start(); cp.wait()
    o_ref[:] = buf[:]
def k7b(h_ref, s_ref, o_ref, buf, sem):
    off = s_ref[0]
    cp = pltpu.make_async_copy(h_ref.at[pl.ds(off, C), :], buf, sem)
    cp.start(); cp.wait()
    o_ref[:] = buf[:]
run("HBM static-offset DMA", lambda t: pl.pallas_call(
    k7, in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
    scratch_shapes=[pltpu.VMEM((C, D), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(t), tab)
run("HBM dyn-offset DMA (SMEM scalar)", lambda t, s: pl.pallas_call(
    k7b, in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
    scratch_shapes=[pltpu.VMEM((C, D), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(t, s),
    tab, jnp.array([128], jnp.int32))

# 8. grid + SMEM per-block id chunk (blocked SMEM spec)
def k8(i_ref, t_ref, o_ref):
    def body(j, _):
        o_ref[pl.ds(j, 1), :] = t_ref[pl.ds(i_ref[j], 1), :]
        return 0
    jax.lax.fori_loop(0, C // 2, body, 0)
run("grid + blocked SMEM ids", lambda i, t: pl.pallas_call(
    k8, grid=(2,),
    in_specs=[pl.BlockSpec((C // 2,), lambda b: (b,), memory_space=pltpu.SMEM),
              pl.BlockSpec((R, D), lambda b: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((C // 2, D), lambda b: (b, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32))(i, t), ids, tab)

# 9. dynamic_gather via take_along_axis (sublane gather)
def k9(t_ref, i_ref, o_ref):
    idx = jnp.broadcast_to(i_ref[:][:, None], (C, D))
    o_ref[:] = jnp.take_along_axis(t_ref[:][:C, :] * 0 +
                                   jnp.take(t_ref[:], jnp.arange(C), axis=0),
                                   idx % C, axis=0)
run("take_along_axis sublane gather", lambda t, i: pl.pallas_call(
    k9, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32))(t, i), tab, ids)
