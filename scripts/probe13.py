"""Round-4 perf probe: fold/unfold kernel variants + payload scatter variants.

Current fold_mean/unfold_mean reshape the b-major (E, 128) stream to
(X, l, 128); with l=5 that array is sublane-padded 5->8 in HBM (1.6x) and the
reshape is a materializing relayout, so each fold pays ~671 MB + 1.07 GB of
hidden traffic before the kernel even reads its 1.07 GB input.  Variant: keep
the stream l-major-within-column so it reshapes FREE to (C, L, B, 128)
(last-two dims (B, 128) tile cleanly), and block the kernels 4-D.

Scatter side: the per-member payload scatter-add runs ~9.7 ns/row; probe
promise_in_bounds, storage-wide acc, argsort cost, bf16 payload.
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
ROWS_T = 265104            # one member table
ROWS = ROWS_T * C          # storage rows
PG, PS = pk.gather_pack(D), pk.scatter_pack(D)
E = C * L * B              # 1310720
X = C * B
LANES = 128

rng = np.random.default_rng(0)
w = jax.device_put(jnp.asarray(rng.standard_normal((ROWS, D)) * 0.05, jnp.float32))
wp = jax.jit(pk.pack_table)(w)
ids_np = rng.integers(0, ROWS_T, (C, L, B), dtype=np.int32)
ids_np += (np.arange(C, dtype=np.int32) * ROWS_T)[:, None, None]
ids4 = jax.device_put(jnp.asarray(ids_np))                     # (C, L, B) l-major
mask4 = jax.device_put(jnp.ones((C, L, B), jnp.float32))
# b-major equivalents (current layout): per column (B, L) flattened row-major
ids_b = jax.device_put(jnp.asarray(
    np.concatenate([ids_np[c].T.reshape(-1) for c in range(C)])))
mask_b = jax.device_put(jnp.ones((E,), jnp.float32))
gx = jax.device_put(jnp.asarray(rng.standard_normal((X, D)), jnp.float32))
gx4 = gx.reshape(C, B, D)
jax.block_until_ready((wp, ids4, ids_b, gx))

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

g_grp, s_grp, s_sub = pk._lane_consts(D)
FOLD = pk.fold_matrix(D)
SFOLD_T = pk.scatter_fold_matrix(D).T

CX = 1024

def fold_mean4(wide4, i4, m4):
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
    )(wide4, i4, m4, g_grp, FOLD)

def unfold_mean4(g4, i4, m4):
    def kernel(g_ref, i_ref, m_ref, sg_ref, ss_ref, f_ref, o_ref):
        gw = jnp.dot(g_ref[0], f_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)    # (CX, 128)
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

    # ---------- FOLD ----------
    @jax.jit
    def cur_take_fold(wp_, ids_, mask_):
        wide = jnp.take(wp_, ids_ // PG, axis=0)
        return pk.fold_mean(wide, ids_, mask_, L, D)
    timeit("CURRENT take + fold_mean (b-major, 3-D blocks)",
           cur_take_fold, wp, ids_b, mask_b)

    @jax.jit
    def lmaj_take_fold(wp_, i4, m4):
        wide4 = jnp.take(wp_, i4.reshape(-1) // PG, axis=0).reshape(
            C, L, B, LANES)
        return fold_mean4(wide4, i4, m4)
    timeit("NEW take + fold_mean4 (l-major, 4-D blocks)",
           lmaj_take_fold, wp, ids4, mask4)

    @jax.jit
    def xla_take_fold(wp_, ids_, mask_):
        wide = jnp.take(wp_, ids_ // PG, axis=0)
        return pk.fold_mean_ref(wide, ids_, mask_, L, D)
    timeit("XLA take + fold_mean_ref (fused)", xla_take_fold, wp, ids_b, mask_b)

    # parity
    a = jax.jit(cur_take_fold)(wp, ids_b, mask_b)
    bmat = jax.jit(lmaj_take_fold)(wp, ids4, mask4)
    # current acts rows: column-major then b; new: (C, B, D) -> same order
    err = float(jnp.max(jnp.abs(a - bmat.reshape(X, D))))
    print(f"fold parity current-vs-4D: {err:.3g}", flush=True)

    # ---------- UNFOLD ----------
    @jax.jit
    def cur_unfold(g, ids_, mask_):
        return pk.unfold_mean(g, ids_, mask_, L)
    timeit("CURRENT unfold_mean (b-major, 3-D blocks)",
           cur_unfold, gx, ids_b, mask_b)

    @jax.jit
    def new_unfold(g4, i4, m4):
        return unfold_mean4(g4, i4, m4)
    timeit("NEW unfold_mean4 (l-major, 4-D blocks)", new_unfold,
           gx4, ids4, mask4)

    pay_cur = jax.jit(cur_unfold)(gx, ids_b, mask_b)         # (E,128) b-major
    pay_new = jax.jit(new_unfold)(gx4, ids4, mask4)          # (C,L,B,128)
    # reorder new to b-major for comparison
    pay_new_b = jnp.concatenate([
        pay_new[c].transpose(1, 0, 2).reshape(L * B, LANES) for c in range(C)])
    err = float(jnp.max(jnp.abs(pay_cur - pay_new_b)))
    print(f"unfold parity current-vs-4D: {err:.3g}", flush=True)

    # ---------- SCATTER ----------
    pay_flat = jax.device_put(pay_new.reshape(E, LANES))
    phys_np = (ids_np - (np.arange(C, dtype=np.int32) * ROWS_T)[:, None, None])
    phys4 = jax.device_put(jnp.asarray(phys_np // PS))
    NP_T = -(-ROWS_T // PS)
    jax.block_until_ready((pay_flat, phys4))
    SPAN = L * B

    @jax.jit
    def scat_members(pay_, phys4_):
        tot = jnp.float32(0)
        for c in range(C):
            acc = jnp.zeros((NP_T, LANES), jnp.float32)
            acc = acc.at[phys4_[c].reshape(-1)].add(
                pay_[c * SPAN:(c + 1) * SPAN], mode="drop")
            tot += acc[0, 0]
        return tot
    timeit("scatter per-member at[].add mode=drop (CURRENT)",
           scat_members, pay_flat, phys4)

    @jax.jit
    def scat_members_pib(pay_, phys4_):
        tot = jnp.float32(0)
        for c in range(C):
            acc = jnp.zeros((NP_T, LANES), jnp.float32)
            acc = acc.at[phys4_[c].reshape(-1)].add(
                pay_[c * SPAN:(c + 1) * SPAN], mode="promise_in_bounds")
            tot += acc[0, 0]
        return tot
    timeit("scatter per-member promise_in_bounds",
           scat_members_pib, pay_flat, phys4)

    NPS = -(-ROWS // PS)
    @jax.jit
    def scat_storage(pay_, phys4_):
        sphys = (phys4_ + (jnp.arange(C, dtype=jnp.int32)
                           * NP_T)[:, None, None]).reshape(-1)
        acc = jnp.zeros((NPS, LANES), jnp.float32)
        acc = acc.at[sphys].add(pay_, mode="promise_in_bounds")
        return acc[0, 0]
    timeit("scatter storage-wide promise_in_bounds", scat_storage,
           pay_flat, phys4)

    pay16 = pay_flat.astype(jnp.bfloat16)
    jax.block_until_ready(pay16)
    @jax.jit
    def scat_members_bf16(pay_, phys4_):
        tot = jnp.float32(0)
        for c in range(C):
            acc = jnp.zeros((NP_T, LANES), jnp.float32)
            acc = acc.at[phys4_[c].reshape(-1)].add(
                pay_[c * SPAN:(c + 1) * SPAN].astype(jnp.float32),
                mode="promise_in_bounds")
            tot += acc[0, 0]
        return tot
    timeit("scatter per-member bf16 payload (f32 acc)",
           scat_members_bf16, pay16, phys4)

    @jax.jit
    def sort_cost(phys4_):
        s = jnp.sort(phys4_.reshape(-1))
        return s[-1]
    timeit("jnp.sort of E ids (baseline for sorted-scatter)",
           sort_cost, phys4)

    @jax.jit
    def argsort_cost(phys4_):
        s = jnp.argsort(phys4_.reshape(-1))
        return s[-1]
    timeit("jnp.argsort of E ids", argsort_cost, phys4)

if __name__ == "__main__":
    main()
