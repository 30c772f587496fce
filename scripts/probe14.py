"""Round-4 perf probe #2 (same-process decomposition, one storage):

1. Pallas streaming ceiling on this chip (trivial block-sum kernel).
2. wide take alone (barrier-forced), from the 33.9 MB packed table.
3. 4-D fold_mean (probe13 variant) given a materialized wide — kernel cost
   isolated from the take.
4. 4-D unfold alone.
5. XLA scatter vs Pallas VMEM-resident scatter-accumulate (per-row dynamic
   stores in a fori_loop, acc block revisited across the sequential grid).
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.embedding import packed as pk

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

C, L, B, D = 4, 5, 65536, 8
ROWS_T = 265104
ROWS = ROWS_T * C
PG, PS = pk.gather_pack(D), pk.scatter_pack(D)
E = C * L * B
LANES = 128

rng = np.random.default_rng(0)
w = jax.device_put(jnp.asarray(rng.standard_normal((ROWS, D)) * 0.05, jnp.float32))
wp = jax.jit(pk.pack_table)(w)
ids_np = rng.integers(0, ROWS_T, (C, L, B), dtype=np.int32)
ids_l = jax.device_put(jnp.asarray(
    ids_np + (np.arange(C, dtype=np.int32) * ROWS_T)[:, None, None]))
mask_l = jax.device_put(jnp.ones((C, L, B), jnp.float32))
gx4 = jax.device_put(jnp.asarray(rng.standard_normal((C, B, D)), jnp.float32))
wide4 = jax.jit(lambda wp_, i: jnp.take(wp_, i.reshape(-1) // PG, axis=0)
                .reshape(C, L, B, LANES))(wp, ids_l)
jax.block_until_ready((wp, ids_l, gx4, wide4))

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

g_grp, s_grp, s_sub = pk._lane_consts(D)
FOLD = pk.fold_matrix(D)
SFOLD_T = pk.scatter_fold_matrix(D).T
CX = 1024

def fold_mean4(wide4_, i4, m4):
    def kernel(w_ref, i_ref, m_ref, g_ref, f_ref, o_ref):
        acc = jnp.zeros((CX, LANES), jnp.float32)
        for j in range(L):
            lg = jax.lax.rem(i_ref[0, j, :], jnp.int32(PG))[:, None]
            acc += (jnp.where(g_ref[:] == lg, w_ref[0, j], 0.0)
                    * m_ref[0, j, :][:, None])
        o_ref[0] = jnp.dot(acc, f_ref[:], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    return pl.pallas_call(
        kernel, grid=(C, B // CX),
        in_specs=[pl.BlockSpec((1, L, CX, LANES), lambda c, i: (c, 0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, L, CX), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, L, CX), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), lambda c, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((LANES, D), lambda c, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, CX, D), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, B, D), jnp.float32),
    )(wide4_, i4, m4, g_grp, FOLD)

def unfold_mean4(g4, i4, m4):
    def kernel(g_ref, i_ref, m_ref, sg_ref, ss_ref, f_ref, o_ref):
        gw = jnp.dot(g_ref[0], f_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        is_g = jnp.where(ss_ref[:] < D, 1.0, 0.0)
        is_c = jnp.where(ss_ref[:] == D, 1.0, 0.0)
        for j in range(L):
            ls = jax.lax.rem(i_ref[0, j, :], jnp.int32(PS))[:, None]
            hit = jnp.where(sg_ref[:] == ls, 1.0, 0.0) * m_ref[0, j, :][:, None]
            o_ref[0, j] = hit * (gw * is_g + is_c)
    return pl.pallas_call(
        kernel, grid=(C, B // CX),
        in_specs=[pl.BlockSpec((1, CX, D), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, L, CX), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, L, CX), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), lambda c, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), lambda c, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((D, LANES), lambda c, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, L, CX, LANES), lambda c, i: (c, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, L, B, LANES), jnp.float32),
    )(g4, i4, m4, s_grp, s_sub, SFOLD_T)

def main():
    print("devices:", jax.devices(), flush=True)

    # ---------- 1. streaming ceiling ----------
    CS = 8192
    def sum_kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += x_ref[:].reshape(CS // 8, 8, LANES).sum(axis=0)
    flat = wide4.reshape(E, LANES)
    @jax.jit
    def ceiling(x):
        return pl.pallas_call(
            sum_kernel, grid=(E // CS,),
            in_specs=[pl.BlockSpec((CS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32))(x)
    dt = timeit("Pallas stream-sum ceiling (671 MB read)", ceiling, flat)
    print(f"   -> {E*LANES*4/dt/1e9:.0f} GB/s", flush=True)

    # ---------- 2. take alone ----------
    @jax.jit
    def take_only(wp_, i):
        wide = jnp.take(wp_, i.reshape(-1) // PG, axis=0)
        wide = jax.lax.optimization_barrier(wide)
        return wide[-1, -1]
    dt = timeit("wide take alone (barrier-forced)", take_only, wp, ids_l)
    print(f"   -> {dt/E*1e9:.2f} ns/id", flush=True)

    # ---------- 3. fold given wide ----------
    @jax.jit
    def fold_only(wide4_, i4, m4):
        return fold_mean4(wide4_, i4, m4)
    dt = timeit("fold_mean4 given wide (671 MB read)", fold_only,
                wide4, ids_l, mask_l)
    print(f"   -> {E*LANES*4/dt/1e9:.0f} GB/s", flush=True)

    # ---------- 4. unfold alone ----------
    @jax.jit
    def unfold_only(g4, i4, m4):
        return unfold_mean4(g4, i4, m4)
    dt = timeit("unfold_mean4 (671 MB write)", unfold_only, gx4, ids_l, mask_l)
    print(f"   -> {E*LANES*4/dt/1e9:.0f} GB/s", flush=True)

    pay4 = jax.jit(unfold_only)(gx4, ids_l, mask_l)

    # ---------- 5. scatter: XLA vs Pallas ----------
    NP_T = -(-ROWS_T // PS)
    NP_PAD = -(-NP_T // 8) * 8
    phys = jax.device_put(jnp.asarray((ids_np[0] // PS).reshape(L * B)))
    pay_m = jax.device_put(pay4[0].reshape(L * B, LANES))
    jax.block_until_ready((phys, pay_m))
    EM = L * B
    CSC = 2048

    @jax.jit
    def xla_scatter(phys_, pay_):
        acc = jnp.zeros((NP_T, LANES), jnp.float32)
        return acc.at[phys_].add(pay_, mode="drop")
    dt = timeit("XLA scatter one member (E=327k)", xla_scatter, phys, pay_m)
    print(f"   -> {dt/EM*1e9:.1f} ns/row", flush=True)

    def scat_kernel(idx_ref, pay_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        def body(r, _):
            p = idx_ref[r]
            o_ref[pl.ds(p, 1), :] += pay_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, CSC, body, 0)
    @jax.jit
    def pallas_scatter(phys_, pay_):
        return pl.pallas_call(
            scat_kernel, grid=(EM // CSC,),
            in_specs=[pl.BlockSpec((CSC,), lambda i: (i,),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((CSC, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NP_PAD, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NP_PAD, LANES), jnp.float32),
        )(phys_, pay_)
    dt = timeit("Pallas scatter-accumulate one member", pallas_scatter,
                phys, pay_m)
    print(f"   -> {dt/EM*1e9:.1f} ns/row", flush=True)

    a = jax.jit(pallas_scatter)(phys, pay_m)[:NP_T]
    b = jax.jit(xla_scatter)(phys, pay_m)
    print(f"scatter parity: {float(jnp.max(jnp.abs(a - b))):.3g}", flush=True)

if __name__ == "__main__":
    main()
