"""Pallas fold/unfold kernels v2 (l-major, L on the grid, scratch acc):
compile + parity + throughput at scale.

Layout: mean-column stream is l-major: flat index e = l*X + x.
fold_mean: grid (X/CX, L); scratch (CX,128) accumulates sum over l;
           at l==L-1 fold lanes to D via const MXU matmul.
unfold:    same grid; each (i,l) step writes gX@FOLD^T * gradmask + cntmask.
"""
# NOTE: historical measurement record of a SUPERSEDED packed-path design
# (the ohm-bitmap helpers it measured were deleted from embedding/packed.py;
# this probe is fully SELF-CONTAINED — it defines its own kernels — so it
# still runs at HEAD and reproduces the era's numbers).
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

D, P = 8, 14
DP = D + 1
NT, B, L = 24, 65_536, 5
X = NT * B
CX = 2048
small = "--small" in sys.argv
if small:
    NT, B = 2, 256
    X = NT * B; CX = 128
E = X * L

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=3, per=E):
    out = fn(*args); fetch(out); out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    f = fetch(out); dt = (time.perf_counter()-t0)/n
    print(f"{name:40s} {dt*1e3:9.1f} ms ({dt/per*1e9:5.2f} ns/id) ({f:.4g})", flush=True)

key = jax.random.PRNGKey(0)
wide = jax.random.normal(key, (E, 128), jnp.float32)   # l-major: e = l*X + x
lane = jax.random.randint(key, (E,), 0, P, jnp.int32)
mask = (jax.random.uniform(key, (E,)) > 0.3).astype(jnp.float32)
gx = jax.random.normal(key, (X, D), jnp.float32)
jax.block_until_ready((wide, lane, mask, gx))

KI = jnp.arange(128, dtype=jnp.int32)
GRP = jnp.where(KI < P * DP, KI // DP, P)
SUB = KI % DP
FOLD = ((SUB[:, None] == jnp.arange(D)[None, :]) &
        (KI[:, None] < P * DP)).astype(jnp.float32)

@jax.jit
def build_ohm(lane_, mask_):
    is_g = (GRP[None, :] == lane_[:, None]) & (SUB[None, :] < D)
    is_c = (GRP[None, :] == lane_[:, None]) & (SUB[None, :] == D)
    m = mask_[:, None] > 0
    return (jnp.where(is_g & m, 1, 0) + jnp.where(is_c & m, 2, 0)).astype(jnp.uint8)
ohm = build_ohm(lane, mask)
jax.block_until_ready(ohm)

# ---- fold_mean kernel: grid (X/CX, L), l fastest ----
def fold_kernel(w_ref, o_ref, f_ref, out_ref, acc):
    l = pl.program_id(1)
    m = jnp.where((o_ref[:] & 1) != 0, w_ref[:], 0.0)
    @pl.when(l == 0)
    def _():
        acc[:] = m
    @pl.when(l > 0)
    def _():
        acc[:] += m
    @pl.when(l == L - 1)
    def _():
        out_ref[:] = jnp.dot(acc[:], f_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

@jax.jit
def fold_mean(w_, o_):
    nb = X // CX
    return pl.pallas_call(
        fold_kernel, grid=(nb, L),
        in_specs=[pl.BlockSpec((CX, 128), lambda i, l: (l * nb + i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CX, 128), lambda i, l: (l * nb + i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, D), lambda i, l: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CX, D), lambda i, l: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CX, 128), jnp.float32)],
    )(w_, o_, FOLD)
timeit("pallas fold_mean v2", lambda w_, o_: fold_mean(w_, o_).sum(), wide, ohm)

out = np.asarray(fold_mean(wide, ohm))
wn, ln, mn = np.asarray(wide), np.asarray(lane), np.asarray(mask)
sel = np.zeros((E, D), np.float32)
for d in range(D):
    sel[:, d] = wn[np.arange(E), ln * DP + d] * mn
ref = sel.reshape(L, X, D).sum(0)          # l-major
print("fold match:", np.allclose(out, ref, atol=1e-4), flush=True)

# ---- unfold kernel ----
def unfold_kernel(g_ref, o_ref, ft_ref, out_ref):
    gw = jnp.dot(g_ref[:], ft_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    o = o_ref[:].astype(jnp.int32)
    out_ref[:] = (gw * (o & 1).astype(jnp.float32)
                  + ((o >> 1) & 1).astype(jnp.float32))

@jax.jit
def unfold(g_, o_):
    nb = X // CX
    return pl.pallas_call(
        unfold_kernel, grid=(nb, L),
        in_specs=[pl.BlockSpec((CX, D), lambda i, l: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CX, 128), lambda i, l: (l * nb + i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((D, 128), lambda i, l: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CX, 128), lambda i, l: (l * nb + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
    )(g_, o_, FOLD.T)
timeit("pallas unfold v2", lambda g_, o_: unfold(g_, o_)[0, 0], gx, ohm)

og = np.asarray(unfold(gx, ohm))
gn = np.asarray(gx)
refg = np.zeros((E, 128), np.float32)
xs = np.tile(np.arange(X), L)              # l-major: e = l*X + x
for d in range(D):
    refg[np.arange(E), ln * DP + d] = gn[xs, d] * mn
refg[np.arange(E), ln * DP + D] += mn
print("unfold match:", np.allclose(og, refg, atol=1e-4), flush=True)

# ---- end-to-end fwd at scale ----
if not small:
    R = 265_008
    RS = NT * R
    RT = -(-RS // P) * P
    w8 = jax.random.normal(key, (RS, D), jnp.float32)
    ids = jax.random.randint(key, (E,), 0, RS, jnp.int32)
    jax.block_until_ready((w8, ids))
    @jax.jit
    def fwd_packed(w_, ids_, o_):
        wp = jnp.pad(w_, ((0, RT - RS), (0, DP - D))).reshape(RT // P, P * DP)
        wp = jnp.pad(wp, ((0, 0), (0, 128 - P * DP)))
        wideg = jnp.take(wp, ids_ // P, axis=0)
        return fold_mean(wideg, o_)
    ohm_ids = build_ohm(ids % P, mask)
    jax.block_until_ready(ohm_ids)
    timeit("fwd packed: pad+take+fold", lambda *a: fwd_packed(*a).sum(),
           w8, ids, ohm_ids)
    timeit("XLA build ohm (E,128) u8", lambda *a: build_ohm(*a)[0, 0].astype(jnp.float32),
           ids % P, mask)
