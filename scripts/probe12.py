"""Packed-layout lazy Adam pass vs current (N,D)+(N,1) layout.

Current: w/m/v/G as (N, 8) + t/cnt/show as (N, 1) — narrow trailing dims.
Packed:  everything as (N/ps, 128) [w0..w7 | t] lane groups; per-row scalars
ride the spare lane; row_mask broadcast per group via a (128,128) 0/1 matmul.
Same math (SparseAdam.update semantics).
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
from recommendsystem_tpu.embedding.optimizers import SparseAdam

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
PS = pk.scatter_pack(D)          # 14
ROWS = 6362496                   # all 24 autoint tables (265104 x 24)
NP = ROWS // PS                  # 454464
opt = SparseAdam()

rng = np.random.default_rng(0)
# current layout
w = jax.device_put(jnp.asarray(rng.standard_normal((ROWS, D)), jnp.float32))
m = jax.device_put(jnp.asarray(rng.standard_normal((ROWS, D)) * 0.01, jnp.float32))
v = jax.device_put(jnp.asarray(np.abs(rng.standard_normal((ROWS, D))) * 1e-4, jnp.float32))
t = jax.device_put(jnp.asarray(rng.integers(0, 50, (ROWS, 1)), jnp.float32))
G = jax.device_put(jnp.asarray(rng.standard_normal((ROWS, D)) * 0.1, jnp.float32))
cnt = jax.device_put(jnp.asarray((rng.random((ROWS, 1)) > 0.8), jnp.float32))
show = jax.device_put(jnp.zeros((ROWS, 1), jnp.float32))

@jax.jit
def cur_pass(w, m, v, t, G, cnt, show):
    row_mask = (cnt > 0).astype(jnp.float32)
    w2, st = opt.update(w, G, {"m": m, "v": v, "t": t}, row_mask)
    return w2, st["m"], st["v"], st["t"], show + cnt

timeit("current (N,8)+(N,1) lazy Adam pass", cur_pass, w, m, v, t, G, cnt, show)

# ---- packed layout ----
LANES = 128
ki = np.arange(LANES)
grp = ki // (D + 1)
sub = ki % (D + 1)
is_w = ((sub < D) & (ki < PS * (D + 1))).astype(np.float32)      # weight lanes
is_t = ((sub == D) & (ki < PS * (D + 1))).astype(np.float32)     # spare lanes
# broadcast matrix: spare lane of group g -> every lane of group g
BCAST = ((grp[:, None] == grp[None, :]) & (sub[:, None] == D)
         & (ki[:, None] < PS * (D + 1)) & (ki[None, :] < PS * (D + 1))
         ).astype(np.float32)

IS_W = jax.device_put(jnp.asarray(is_w))
IS_T = jax.device_put(jnp.asarray(is_t))
BC = jax.device_put(jnp.asarray(BCAST))

def pack9(a, scalar=None):
    """(N, D) [+ (N,1) scalar] -> (N/ps, 128) [a0..a7 | s] groups."""
    s = np.zeros((ROWS, 1), np.float32) if scalar is None else np.asarray(scalar)
    grpd = np.concatenate([np.asarray(a), s], axis=1).reshape(NP, PS * (D + 1))
    out = np.zeros((NP, LANES), np.float32)
    out[:, :PS * (D + 1)] = grpd
    return jax.device_put(jnp.asarray(out))

wp = pack9(np.asarray(w))
mp = pack9(np.asarray(m), np.asarray(t))          # t rides m's spare lane
vp = pack9(np.asarray(v))
Gp = pack9(np.asarray(G), np.asarray(cnt))        # cnt rides G's spare lane
showp = pack9(np.zeros((ROWS, D)), np.asarray(show))

B1, B2, LR, EPS = opt.beta1, opt.beta2, opt.learning_rate, opt.epsilon

@jax.jit
def packed_pass(wp, mp, vp, Gp, showp):
    cnt_l = Gp * IS_T                                  # counts at spare lanes
    rm = pk._dot_hi(cnt_l, BC)                         # (NP,128) cnt per group
    live = rm > 0
    t_l = mp * IS_T                                    # t at spare lanes
    t_new = t_l + (cnt_l > 0).astype(jnp.float32)      # advance touched rows
    t128 = pk._dot_hi(t_new, BC)
    t128 = jnp.maximum(t128, 1.0)
    m_new = jnp.where(live, B1 * mp + (1 - B1) * Gp, mp) * IS_W + t_new
    v_new = jnp.where(live, B2 * vp + (1 - B2) * jnp.square(Gp), vp) * IS_W
    m_hat = m_new / (1 - B1 ** t128)
    v_hat = v_new / (1 - B2 ** t128)
    step = LR * m_hat / (jnp.sqrt(v_hat) + EPS)
    w_new = jnp.where(live, wp - step, wp) * IS_W
    show_new = showp + cnt_l
    return w_new, m_new, v_new, show_new

timeit("packed (N/14,128) lazy Adam pass", packed_pass, wp, mp, vp, Gp, showp)

# parity
w2, m2, v2, t2, show2 = jax.jit(cur_pass)(w, m, v, t, G, cnt, show)
wp2, mp2, vp2, showp2 = jax.jit(packed_pass)(wp, mp, vp, Gp, showp)

def unpack9(a, col=None):
    a = np.asarray(a)[:, :PS * (D + 1)].reshape(ROWS, D + 1)
    return a[:, D:] if col == "s" else a[:, :D]

print("w  parity:", np.abs(unpack9(wp2) - np.asarray(w2)).max())
print("m  parity:", np.abs(unpack9(mp2) - np.asarray(m2)).max())
print("v  parity:", np.abs(unpack9(vp2) - np.asarray(v2)).max())
print("t  parity:", np.abs(unpack9(mp2, "s") - np.asarray(t2)).max())
print("sh parity:", np.abs(unpack9(showp2, "s") - np.asarray(show2)).max())
