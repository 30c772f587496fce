"""Probe: (a) gather ns/id vs table size + dtype, (b) scatter ns/row vs acc
size, (c) Pallas scatter with unrolled dynamic RMWs, (d) fused unfold+scatter
kernel (payload never hits HBM).  Full packed step runs first as the
same-process calibration anchor (ambient drift here is up to 3x)."""
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

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---- calibration anchor ----
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
timeit("FULL packed step (calibration ~273ms nominal)", lambda: step(
    state, batch, labels, weight, None, rng_)[1]["loss"])

E = 1310720
LANES = 128
rng = np.random.default_rng(0)

# ---- (a) gather ns/id vs table size ----
print("--- gather ns/id vs table rows (512 B rows) ---", flush=True)
for rows_k, dt_ in [(16, jnp.float32), (33, jnp.float32), (66, jnp.float32),
                    (132, jnp.float32), (264, jnp.float32), (66, jnp.bfloat16),
                    (132, jnp.bfloat16)]:
    rows = rows_k * 1024
    tbl = jax.device_put(jnp.asarray(
        rng.standard_normal((rows, LANES)), dt_))
    ids = jax.device_put(jnp.asarray(
        rng.integers(0, rows, (E,), dtype=np.int32)))
    jax.block_until_ready((tbl, ids))
    @jax.jit
    def take_only(t, i):
        wide = jnp.take(t, i, axis=0)
        wide = jax.lax.optimization_barrier(wide)
        return wide[-1, -1].astype(jnp.float32)
    mb = rows * LANES * tbl.dtype.itemsize / 1e6
    dt = timeit(f"take E=1.31M from {mb:6.1f} MB table ({tbl.dtype})",
                take_only, tbl, ids)
    print(f"   -> {dt/E*1e9:.2f} ns/id", flush=True)

# ---- (b) XLA scatter ns/row vs acc rows ----
print("--- XLA scatter ns/row vs acc rows (512 B rows) ---", flush=True)
EM = 327680
pay = jax.device_put(jnp.asarray(rng.standard_normal((EM, LANES)), jnp.float32))
for acc_k in (2, 9, 19, 38, 76):
    acc_rows = acc_k * 1024
    ph = jax.device_put(jnp.asarray(
        rng.integers(0, acc_rows, (EM,), dtype=np.int32)))
    jax.block_until_ready((pay, ph))
    @jax.jit
    def xsc(ph_, pay_):
        acc = jnp.zeros((acc_rows, LANES), jnp.float32)
        return acc.at[ph_].add(pay_, mode="drop")
    dt = timeit(f"XLA scatter EM=327k into {acc_rows*512//1024//1024:3d} MB acc",
                xsc, ph, pay)
    print(f"   -> {dt/EM*1e9:.1f} ns/row", flush=True)

# ---- (c) Pallas scatter, unrolled RMW ----
print("--- Pallas scatter unroll ---", flush=True)
NP_T = 18944
ph = jax.device_put(jnp.asarray(
    rng.integers(0, NP_T - 8, (EM,), dtype=np.int32)))
jax.block_until_ready(ph)
CSC = 2048
for unroll in (1, 4, 8):
    def scat_kernel(idx_ref, pay_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        def body(r0, _):
            for u in range(unroll):
                r = r0 * unroll + u
                p = idx_ref[r]
                o_ref[pl.ds(p, 1), :] += pay_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, CSC // unroll, body, 0)
    @jax.jit
    def pscat(ph_, pay_):
        return pl.pallas_call(
            scat_kernel, grid=(EM // CSC,),
            in_specs=[pl.BlockSpec((CSC,), lambda i: (i,),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((CSC, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NP_T, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NP_T, LANES), jnp.float32),
        )(ph_, pay_)
    dt = timeit(f"Pallas scatter unroll={unroll}", pscat, ph, pay)
    print(f"   -> {dt/EM*1e9:.1f} ns/row", flush=True)

# parity for unroll=8 (conflicts within a group must still accumulate — the
# sequential += per row in the unrolled body keeps program order)
a = jax.jit(pscat)(ph, pay)
@jax.jit
def xsc2(ph_, pay_):
    acc = jnp.zeros((NP_T, LANES), jnp.float32)
    return acc.at[ph_].add(pay_, mode="drop")
b = jax.jit(xsc2)(ph, pay)
print(f"unroll parity vs XLA: {float(jnp.max(jnp.abs(a - b))):.3g}", flush=True)

# ---- (d) fused unfold + scatter (one member: X=65536 rows, L=5, D=8) ----
print("--- fused unfold+scatter ---", flush=True)
D = 8
PS = pk.scatter_pack(D)
X = 65536
gx = jax.device_put(jnp.asarray(rng.standard_normal((X, D)), jnp.float32))
ids_m = jax.device_put(jnp.asarray(
    rng.integers(0, 265104, (L := 5, X), dtype=np.int32)))
SFOLD_T = pk.scatter_fold_matrix(D).T
_, s_grp, s_sub = pk._lane_consts(D)
jax.block_until_ready((gx, ids_m))
CXF = 512

def fused_kernel(idx_ref, g_ref, sg_ref, ss_ref, f_ref, o_ref, gws):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    gws[:] = jnp.dot(g_ref[:], f_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)    # (CXF, 128)
    is_g = jnp.where(ss_ref[:] < D, 1.0, 0.0)
    is_c = jnp.where(ss_ref[:] == D, 1.0, 0.0)
    def body(r, _):
        row = gws[pl.ds(r, 1), :]
        for j in range(L):
            rid = idx_ref[j * CXF + r]
            ls = jax.lax.rem(rid, PS)
            p = jax.lax.div(rid, PS)
            hit = jnp.where(sg_ref[:] == ls, 1.0, 0.0)
            o_ref[pl.ds(p, 1), :] += hit * (row * is_g + is_c)
        return 0
    jax.lax.fori_loop(0, CXF, body, 0)

@jax.jit
def fused(ids_, g_):
    # ids blocked (L, CXF) per grid step -> flat SMEM (L*CXF,)
    i2 = ids_.reshape(L, X // CXF, CXF).transpose(1, 0, 2).reshape(-1)
    return pl.pallas_call(
        fused_kernel, grid=(X // CXF,),
        in_specs=[pl.BlockSpec((L * CXF,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((CXF, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((D, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NP_T, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP_T, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CXF, LANES), jnp.float32)],
    )(i2, g_, s_grp, s_sub, SFOLD_T)
dt = timeit("fused unfold+scatter one member (E=327k)", fused, ids_m, gx)
print(f"   -> {dt/(L*X)*1e9:.1f} ns/row", flush=True)

# parity: reference = unfold_rows_ref + scatter
@jax.jit
def ref_path(ids_, g_):
    flat_ids = ids_.reshape(-1)
    gE = jnp.broadcast_to(g_[None], (L, X, D)).reshape(L * X, D)
    payload = pk.unfold_rows_ref(gE, flat_ids, jnp.ones((L * X,), jnp.float32))
    acc = jnp.zeros((NP_T, LANES), jnp.float32)
    return acc.at[flat_ids // PS].add(payload, mode="drop")
a = jax.jit(fused)(ids_m, gx)
b = jax.jit(ref_path)(ids_m, gx)
print(f"fused parity: {float(jnp.max(jnp.abs(a - b))):.3g}", flush=True)
