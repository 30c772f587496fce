"""Final design probes (wide pipeline, no narrow E-scale intermediates):
fused wide forward, autodiff backward chain, scatter256 for counts,
dense lazy adam."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

R, D, P = 265_008, 8, 16
NT, B, L = 24, 65_536, 5
RS = NT * R
RSP = RS // P
E = B * L * NT
X = NT * B

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=3, per=E):
    out = fn(*args); fetch(out)
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt*1e3:9.2f} ms  ({dt/per*1e9:6.2f} ns/id) ({f:.4g})",
          flush=True)
    return dt

key = jax.random.PRNGKey(0)
ids = jax.random.randint(key, (E,), 0, RS, jnp.int32)
mask = (jax.random.uniform(key, (E,)) > 0.3).astype(jnp.float32)
w = jax.random.normal(key, (RS, D), jnp.float32)
jax.block_until_ready((ids, mask, w))

LANE_GROUP = (jnp.arange(P * D, dtype=jnp.int32) // D)[None, :]   # (1,128)
FOLD = (jnp.arange(P * D, dtype=jnp.int32)[:, None] % D
        == jnp.arange(D, dtype=jnp.int32)[None, :]).astype(jnp.float32)  # (128,D)

def fwd_wide(w_, ids_, mask_):
    wp = w_.reshape(RSP, P * D)
    wide = jnp.take(wp, ids_ // P, axis=0)                    # (E, 128)
    ohrep = ((ids_ % P)[:, None] == LANE_GROUP).astype(w_.dtype)  # (E,128)
    masked = wide * ohrep * mask_[:, None]                    # (E, 128)
    m3 = masked.reshape(X, L, P * D).sum(1)                   # (X, 128)
    cnt = jnp.maximum(mask_.reshape(X, L).sum(1), 1.0)
    out = (m3 @ FOLD) / cnt[:, None]                          # (X, D)
    return out

f_fwd = jax.jit(lambda w_, i, m: fwd_wide(w_, i, m).sum())
timeit("fused wide fwd (take+fold+mean)", f_fwd, w, ids, mask)

outw = np.asarray(jax.jit(fwd_wide)(w, ids, mask))
wn, idn, mn = np.asarray(w), np.asarray(ids), np.asarray(mask)
raw = wn[idn] * mn[:, None]
ref = raw.reshape(X, L, D).sum(1) / np.maximum(
    mn.reshape(X, L).sum(1), 1.0)[:, None]
print("fwd match:", np.allclose(outw, ref, atol=1e-4), flush=True)

# autodiff backward: wide grad + wide scatter, end-to-end
@jax.jit
def train_sparse_only(w_, ids_, mask_):
    def lf(w__):
        out = fwd_wide(w__, ids_, mask_)
        return jnp.sum(out ** 2)
    G = jax.grad(lf)(w_)           # (RS, D) dense grad via wide scatter
    return G
timeit("autodiff bwd chain -> dense G (RS,D)",
       lambda *a: train_sparse_only(*a)[0, 0], w, ids, mask)

# manual wide scatter of [grad128 || maskrep] (E,256) -> G + counts
g128 = jax.random.normal(key, (E, P * D), jnp.float32)
jax.block_until_ready(g128)
@jax.jit
def scatter_g_and_cnt(ids_, gg, mask_):
    ohrep = ((ids_ % P)[:, None] == LANE_GROUP).astype(jnp.float32)
    payload = jnp.concatenate([gg, ohrep * mask_[:, None]], axis=1)  # (E,256)
    out = jnp.zeros((RSP, 2 * P * D), jnp.float32).at[ids_ // P].add(payload)
    G = out[:, :P * D].reshape(RS, D)
    cnt = out[:, P * D:].reshape(RS, D)[:, :1]
    return G, cnt
timeit("wide scatter G+cnt (E,256)",
       lambda *a: scatter_g_and_cnt(*a)[0][0, 0], ids, g128, mask)

# check counts correctness
G_, c_ = jax.jit(scatter_g_and_cnt)(ids, g128, mask)
cref = np.zeros((RS,), np.float32)
np.add.at(cref, idn, mn)
print("cnt match:", np.allclose(np.asarray(c_)[:, 0], cref), flush=True)

# wide scatter 128 only (for comparison)
@jax.jit
def scatter_g(ids_, gg):
    return jnp.zeros((RSP, P * D), jnp.float32).at[ids_ // P].add(gg)[0, 0]
timeit("wide scatter G only (E,128)", scatter_g, ids, g128)

# dense lazy adam over full storage
m = jnp.zeros((RS, D), jnp.float32)
v = jnp.zeros((RS, D), jnp.float32)
t_ = jnp.zeros((RS, 1), jnp.float32)
G = jax.random.normal(key, (RS, D), jnp.float32)
cnt = (jax.random.uniform(key, (RS, 1)) > 0.5).astype(jnp.float32)
jax.block_until_ready((m, v, t_, G, cnt))
@jax.jit
def dense_adam(w_, m_, v_, t0, G_, c_):
    rm = (c_ > 0)
    t1 = t0 + rm
    m1 = jnp.where(rm, 0.9 * m_ + 0.1 * G_, m_)
    v1 = jnp.where(rm, 0.999 * v_ + 0.001 * G_ * G_, v_)
    ts = jnp.maximum(t1, 1.0)
    mh = m1 / (1 - 0.9 ** ts)
    vh = v1 / (1 - 0.999 ** ts)
    w1 = jnp.where(rm, w_ - 5e-5 * mh / (jnp.sqrt(vh) + 1e-8), w_)
    return w1, m1, v1, t1
timeit("dense lazy adam (6.36M x 8 storage)",
       lambda *a: dense_adam(*a)[0][0, 0], w, m, v, t_, G, cnt, per=RS)
