"""Can XLA fusion beat the materialize-then-Pallas pipeline?

Forward:  take -> [Pallas fold3D]   vs   take -> jnp fold (fused)
          vs  take -> jnp fold with lane mask computed FROM IDS (no ohm).
Backward: Pallas unfold -> scatter  vs  jnp unfold (fused into scatter
          operand)  vs  from-ids unfold -> scatter; per-table scatter vs
          one storage-level scatter.
Shapes: one autoint headline storage (4 x 265104-row x 8-dim tables,
E = 1.31M stream rows, l=5).
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.embedding import packed as pk

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=3):
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter()-t0)/n
    print(f"{name:52s} {dt*1e3:9.2f} ms  (fetch={f:.5g})", flush=True)
    return dt

D = 8
ROWS = 1060416           # 4 member tables x 265104
L = 5
X = 262144               # 64k batch x 4 columns... (X*L = E)
E = X * L
PG = pk.gather_pack(D)   # 16
PS = pk.scatter_pack(D)  # 14

rng = np.random.default_rng(0)
ids_h = rng.integers(0, ROWS, size=E).astype(np.int32)
mask_h = (rng.random(E) > 0.3).astype(np.float32)

ids = jax.device_put(jnp.asarray(ids_h))
mask = jax.device_put(jnp.asarray(mask_h))
w = jax.device_put(jnp.asarray(rng.standard_normal((ROWS, D)), jnp.float32))
wp_h = np.zeros((ROWS // PG, 128), np.float32)
wp_h[:, :PG * D] = np.asarray(rng.standard_normal((ROWS, D)), np.float32
                              ).reshape(ROWS // PG, PG * D)
wp = jax.device_put(jnp.asarray(wp_h))   # pre-packed (ROWS/PG, 128)
gx = jax.device_put(jnp.asarray(rng.standard_normal((X, D)), jnp.float32))
ohm = jax.jit(lambda i, m: pk.build_ohm(i, m, D))(ids, mask)
jax.block_until_ready((ids, mask, w, wp, gx, ohm))
print("devices:", jax.devices(), "  E =", E, flush=True)

FOLD = pk.fold_matrix(D)
SFT = pk.scatter_fold_matrix(D).T
_, _, G_GRP, S_GRP, S_SUB = pk._lane_maps(D)
g_grp = jnp.asarray(G_GRP, jnp.int32)
s_grp = jnp.asarray(S_GRP, jnp.int32)
s_sub = jnp.asarray(S_SUB, jnp.int32)

# ---------------- forward ----------------

@jax.jit
def fwd_pallas(wp, ids, ohm):
    wide = jnp.take(wp, ids // PG, axis=0)
    return pk.fold_mean_tpu(wide, ohm, L, D)

@jax.jit
def fwd_xla_ohm(wp, ids, ohm):
    wide = jnp.take(wp, ids // PG, axis=0)
    return pk.fold_mean_ref(wide, ohm, L, D)

@jax.jit
def fwd_xla_ids(wp, ids, mask):
    wide = jnp.take(wp, ids // PG, axis=0)
    sel = ((g_grp[None, :] == (ids % PG).astype(jnp.int32)[:, None])
           & (mask > 0)[:, None])
    m = jnp.where(sel, wide, 0.0)
    s = m.reshape(L, X, 128).sum(0)
    return pk._dot_hi(s, FOLD)

a = timeit("fwd take->Pallas fold3D (current)", fwd_pallas, wp, ids, ohm)
b = timeit("fwd take->XLA fold (ohm)", fwd_xla_ohm, wp, ids, ohm)
c = timeit("fwd take->XLA fold (from ids, no ohm)", fwd_xla_ids, wp, ids, mask)
ra = np.asarray(fwd_pallas(wp, ids, ohm))
rb = np.asarray(fwd_xla_ohm(wp, ids, ohm))
rc = np.asarray(fwd_xla_ids(wp, ids, mask))
print("   parity b:", np.abs(ra-rb).max(), " c:", np.abs(ra-rc).max(), flush=True)

# ---------------- backward: unfold + scatter ----------------
NP_S = ROWS // PS        # storage-level acc rows (75744)

def scat_storage(pay):
    acc = jnp.zeros((NP_S, 128), jnp.float32)
    return acc.at[ids // PS].add(pay, mode="drop")

@jax.jit
def bwd_pallas(gx, ids, ohm):
    pay = pk.unfold_mean_tpu(gx, ohm, L)
    return scat_storage(pay)

@jax.jit
def bwd_xla_ohm(gx, ids, ohm):
    pay = pk.unfold_mean_ref(gx, ohm, L)
    return scat_storage(pay)

@jax.jit
def bwd_xla_ids(gx, ids, mask):
    gw = pk._dot_hi(gx, SFT)                       # (X, 128)
    gr = jnp.tile(gw, (L, 1))                      # (E, 128)
    ls = (ids % PS).astype(jnp.int32)[:, None]
    mm = (mask > 0)[:, None]
    b1 = (s_grp[None] == ls) & (s_sub[None] < D) & mm
    b2 = (s_grp[None] == ls) & (s_sub[None] == D) & mm
    pay = gr * b1 + b2.astype(jnp.float32)
    return scat_storage(pay)

d_ = timeit("bwd Pallas unfold -> storage scatter", bwd_pallas, gx, ids, ohm)
e_ = timeit("bwd XLA unfold(ohm) -> storage scatter", bwd_xla_ohm, gx, ids, ohm)
f_ = timeit("bwd XLA unfold(from ids) -> storage scatter", bwd_xla_ids, gx, ids, mask)
pa = np.asarray(bwd_pallas(gx, ids, ohm))
pb = np.asarray(bwd_xla_ohm(gx, ids, ohm))
pc = np.asarray(bwd_xla_ids(gx, ids, mask))
print("   parity e:", np.abs(pa-pb).max(), " f:", np.abs(pa-pc).max(), flush=True)

# per-table scatters (4 spans of E/4... approximate current shape: 4 tables,
# L*1 spans each of X/4*... use 20 spans of E/20 like the real span structure)
NT = 4
NP_T = (ROWS // NT) // PS

@jax.jit
def bwd_pertable(gx, ids, ohm):
    pay = pk.unfold_mean_tpu(gx, ohm, L)
    outs = []
    for t in range(NT):
        off = t * (ROWS // NT)
        acc = jnp.zeros((NP_T, 128), jnp.float32)
        for s in range(L):
            lo = s * X + t * (X // NT)
            n = X // NT
            seg_ids = jax.lax.dynamic_slice(ids, (lo,), (n,))
            seg_pay = jax.lax.dynamic_slice(pay, (lo, 0), (n, 128))
            phys = (seg_ids - off) // PS
            acc = acc.at[phys].add(seg_pay, mode="drop")
        outs.append(acc[0, 0])
    return jnp.stack(outs)

g2 = timeit("bwd Pallas unfold -> 4x5 per-table scatters*", bwd_pertable, gx, ids, ohm)
print("  (*ids not table-partitioned so drops differ; timing only)")

# scatter alone (payload pre-materialized)
pay = jax.jit(lambda g, o: pk.unfold_mean_tpu(g, o, L))(gx, ohm)
jax.block_until_ready(pay)
timeit("storage scatter alone (pay materialized)", jax.jit(scat_storage), pay)
