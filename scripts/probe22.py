"""packed_adam_update spare-lane broadcast variants, on chip.

The round-5 ctr212 trace attributed ~51 ms/step to the two HIGHEST-
precision (np, 128) @ (128, 128) broadcast matmuls inside the packed Adam
pass (56 storages x d=96).  Variants:

  A: BC matmul at HIGHEST (probe12 original)
  B: ps == 1 column slice + implicit broadcast (d >= 64: each 128-lane row
     IS one logical row, so the spare lane is just column d)
  C: static lane-index take (general ps): t128 = t_new[:, SPREAD_IDX]
     with SPREAD_IDX[l] = grp(l) * (d+1) + d — a constant lane gather

Shapes: ctr212 regime (d=96, 98304-row storages x a few) and headline
regime (d=8, 454464 phys rows).
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

def timeit(name, fn, *args, n=5):
    out = fn(*args); fetch(out)
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter()-t0)/n
    print(f"{name:44s} {dt*1e3:9.2f} ms  (fetch={f:.6g})", flush=True)
    return dt

opt = SparseAdam()

def variant_bc(tstate, acc, d):
    return pk.packed_adam_update(opt, tstate, acc, d)

def variant_col(tstate, acc, d):
    """ps == 1: spare lane is column d; everything broadcasts from (np, 1)."""
    is_w, is_t, _ = pk._state_lane_consts(d)
    IS_W, IS_T = jnp.asarray(is_w), jnp.asarray(is_t)
    wp, mp, vp = tstate["w"], tstate["opt"]["m_p"], tstate["opt"]["v_p"]
    b1, b2 = opt.beta1, opt.beta2
    cnt = acc[:, d:d + 1]
    live = cnt > 0
    t_col = mp[:, d:d + 1] + live.astype(jnp.float32)
    t128 = jnp.maximum(t_col, 1.0)
    g = acc * IS_W
    m_new = jnp.where(live, b1 * mp + (1 - b1) * g, mp) * IS_W
    v_new = jnp.where(live, b2 * vp + (1 - b2) * jnp.square(g), vp) * IS_W
    m_hat = m_new / (1 - b1 ** t128)
    v_hat = v_new / (1 - b2 ** t128)
    step = opt.learning_rate * m_hat / (jnp.sqrt(v_hat) + opt.epsilon)
    w_new = (jnp.where(live, wp - step, wp) * IS_W
             + wp * IS_T + acc * IS_T)
    return {"w": w_new, "opt": {"m_p": m_new + t_col * IS_T, "v_p": v_new}}

def spread_idx(d):
    ps = pk.scatter_pack(d)
    ki = np.arange(128)
    grp = np.minimum(ki // (d + 1), ps - 1)
    return jnp.asarray(grp * (d + 1) + d, jnp.int32)

def variant_take(tstate, acc, d):
    """general ps: broadcast spare lanes to their group via a constant
    lane gather."""
    is_w, is_t, _ = pk._state_lane_consts(d)
    IS_W, IS_T = jnp.asarray(is_w), jnp.asarray(is_t)
    idx = spread_idx(d)
    wp, mp, vp = tstate["w"], tstate["opt"]["m_p"], tstate["opt"]["v_p"]
    b1, b2 = opt.beta1, opt.beta2
    cnt_l = acc * IS_T
    cnt128 = jnp.take(acc, idx, axis=1)
    live = cnt128 > 0
    t_new = mp * IS_T + (cnt_l > 0).astype(jnp.float32)
    t128 = jnp.maximum(jnp.take(mp, idx, axis=1)
                       + (cnt128 > 0).astype(jnp.float32), 1.0)
    g = acc * IS_W
    m_new = jnp.where(live, b1 * mp + (1 - b1) * g, mp) * IS_W
    v_new = jnp.where(live, b2 * vp + (1 - b2) * jnp.square(g), vp) * IS_W
    m_hat = m_new / (1 - b1 ** t128)
    v_hat = v_new / (1 - b2 ** t128)
    step = opt.learning_rate * m_hat / (jnp.sqrt(v_hat) + opt.epsilon)
    w_new = (jnp.where(live, wp - step, wp) * IS_W + wp * IS_T + cnt_l)
    return {"w": w_new, "opt": {"m_p": m_new + t_new, "v_p": v_new}}

for d, np_rows, reps in [(96, 98304, 8), (8, 454464, 1)]:
    ps = pk.scatter_pack(d)
    print(f"\n== d={d} ps={ps} np={np_rows} x{reps} storages", flush=True)
    rng = np.random.default_rng(0)
    def mk():
        return {"w": jax.device_put(jnp.asarray(
                    rng.standard_normal((np_rows, 128)), jnp.float32)),
                "opt": {"m_p": jax.device_put(jnp.asarray(
                            rng.standard_normal((np_rows, 128)) * .01, jnp.float32)),
                        "v_p": jax.device_put(jnp.asarray(
                            np.abs(rng.standard_normal((np_rows, 128))) * 1e-4,
                            jnp.float32))}}
    states = [mk() for _ in range(reps)]
    accs = [jax.device_put(jnp.asarray(
        rng.standard_normal((np_rows, 128)).astype(np.float32)
        * (rng.random((np_rows, 1)) < 0.3), jnp.float32)) for _ in range(reps)]

    def run(var):
        def f(states, accs):
            return [var(s, a, d) for s, a in zip(states, accs)]
        return jax.jit(f)

    a = timeit("A: BC matmul (current)", run(variant_bc), states, accs)
    if ps == 1:
        b = timeit("B: column broadcast", run(variant_col), states, accs)
    c = timeit("C: lane-index take", run(variant_take), states, accs)
    # parity
    ra = variant_bc(states[0], accs[0], d)
    rc = variant_take(states[0], accs[0], d)
    err = max(float(jnp.abs(x - y).max()) for x, y in
              zip(jax.tree.leaves(ra), jax.tree.leaves(rc)))
    print(f"   A vs C parity: {err:.3e}", flush=True)
    if ps == 1:
        rb = variant_col(states[0], accs[0], d)
        err = max(float(jnp.abs(x - y).max()) for x, y in
                  zip(jax.tree.leaves(ra), jax.tree.leaves(rb)))
        print(f"   A vs B parity: {err:.3e}", flush=True)
