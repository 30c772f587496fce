"""Probe: XLA-fused unfold-into-scatter vs current Pallas unfold + scatter.

Current backward materializes the (E, 128) payload (Pallas unfold writes
671 MB/storage, scatter reads it back).  Variant: materialize only the small
gw = g @ SFOLD.T (X, 128) per segment, and give the scatter an UPDATES
expression (broadcast of gw rows x iota lane masks) that XLA can fuse into
the scatter — payload never exists in HBM.

Also decomposes the 31.7 ms dense fwd/bwd.
"""
# NOTE: historical measurement record of the round-3/4 B-MAJOR stream era
# (unfold_mean's signature and stream layout have since changed: l-major
# streams, per-column unfolds, packed optimizer state).  Kept as the
# measurement that rejected fused-scatter-updates in favor of the
# materialized Pallas payload; this script no longer runs at HEAD.
import sys as _sys
print(__doc__)
print("HISTORICAL: this probe measured the superseded b-major stream design;"
      " unfold_mean's signature/layout changed in rounds 4-5."
      " Kept as the measurement record. Exiting without running.")
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
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter()-t0)/n
    print(f"{name:56s} {dt*1e3:9.2f} ms  (fetch={f:.5g})", flush=True)
    return dt

# ---- calibration anchor ----
from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step, \
    _model_outputs_and_loss
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

C, L, B, D = 4, 5, 65536, 8
ROWS_T = 265104
PS = pk.scatter_pack(D)
E = C * L * B
X = C * B
LANES = 128
NP_T = -(-ROWS_T // PS)

rng = np.random.default_rng(0)
ids_np = rng.integers(0, ROWS_T, (C, B, L), dtype=np.int32)   # b-major
ids_b = jax.device_put(jnp.asarray(ids_np.reshape(E)))        # col-then-b-major
mask_b = jax.device_put(jnp.ones((E,), jnp.float32))
gx = jax.device_put(jnp.asarray(rng.standard_normal((X, D)), jnp.float32))
jax.block_until_ready((ids_b, gx))

SPAN = B * L

# ---- A. current: Pallas unfold -> per-member scatter ----
@jax.jit
def cur_backward(g, ids_, mask_):
    pay = pk.unfold_mean(g, ids_, mask_, L)
    tot = jnp.float32(0)
    for c in range(C):
        phys = ids_[c * SPAN:(c + 1) * SPAN] // PS
        acc = jnp.zeros((NP_T, LANES), jnp.float32)
        acc = acc.at[phys].add(pay[c * SPAN:(c + 1) * SPAN], mode="drop")
        tot += acc[0, 0] + acc[-1, -1]
    return tot
timeit("A. Pallas unfold + per-member scatter (CURRENT)",
       cur_backward, gx, ids_b, mask_b)

# ---- B. fused: scatter consumes the unfold expression ----
_, s_grp, s_sub = pk._lane_consts(D)
SFOLD_T = pk.scatter_fold_matrix(D).T

@jax.jit
def fused_backward(g, ids_, mask_):
    gw = pk._dot_hi(g, SFOLD_T)                       # (X, 128), 33.5 MB
    is_g = (s_sub < D)
    is_c = (s_sub == D)
    tot = jnp.float32(0)
    for c in range(C):
        i_c = ids_[c * SPAN:(c + 1) * SPAN]
        m_c = mask_[c * SPAN:(c + 1) * SPAN]
        gw_c = gw[c * B:(c + 1) * B]                  # (B, 128)
        # payload expression: XLA should fuse this into the scatter updates
        ls = (i_c % PS).astype(jnp.int32)[:, None]
        hit = (s_grp == ls) & (m_c > 0)[:, None]      # (E_c, 128)
        gw_e = jnp.broadcast_to(gw_c[:, None, :], (B, L, LANES)).reshape(
            SPAN, LANES)
        pay = jnp.where(hit, gw_e * is_g + is_c, 0.0)
        acc = jnp.zeros((NP_T, LANES), jnp.float32)
        acc = acc.at[i_c // PS].add(pay, mode="drop")
        tot += acc[0, 0] + acc[-1, -1]
    return tot
timeit("B. XLA-fused unfold-into-scatter", fused_backward, gx, ids_b, mask_b)

a = jax.jit(cur_backward)(gx, ids_b, mask_b)
b = jax.jit(fused_backward)(gx, ids_b, mask_b)
print(f"A-vs-B fetch diff: {abs(float(a)-float(b)):.3g}", flush=True)

# full-parity check on the accumulators
@jax.jit
def cur_acc0(g, ids_, mask_):
    pay = pk.unfold_mean(g, ids_, mask_, L)
    acc = jnp.zeros((NP_T, LANES), jnp.float32)
    return acc.at[ids_[:SPAN] // PS].add(pay[:SPAN], mode="drop")
@jax.jit
def fused_acc0(g, ids_, mask_):
    gw = pk._dot_hi(g, SFOLD_T)
    i_c = ids_[:SPAN]; m_c = mask_[:SPAN]
    ls = (i_c % PS).astype(jnp.int32)[:, None]
    hit = (s_grp == ls) & (m_c > 0)[:, None]
    gw_e = jnp.broadcast_to(gw[:B][:, None, :], (B, L, LANES)).reshape(
        SPAN, LANES)
    pay = jnp.where(hit, gw_e * (s_sub < D) + (s_sub == D), 0.0)
    acc = jnp.zeros((NP_T, LANES), jnp.float32)
    return acc.at[i_c // PS].add(pay, mode="drop")
pa = jax.jit(cur_acc0)(gx, ids_b, mask_b)
pb = jax.jit(fused_acc0)(gx, ids_b, mask_b)
print(f"acc parity: {float(jnp.max(jnp.abs(pa - pb))):.3g}", flush=True)

# ---- C. dense fwd/bwd decomposition ----
from recommendsystem_tpu.train.step import make_train_step as _m
eng = bundle.embedding
pk_st, _ = pk.storages_packed(eng)
plans = pk.plan_segments(eng, batch, storages=set(pk_st))
weights = eng.weights(state.tables)
ctx = jax.jit(lambda w, bt: pk.gather_fold(eng, w, bt, plans))(weights, batch)
jax.block_until_ready(jax.tree.leaves(ctx))
acts = {skey: c["acts"] for skey, c in ctx.items()}

@jax.jit
def fwd_only(params, acts_):
    embs = pk.combine_from_acts(
        eng, plans, {s: {"acts": a} for s, a in acts_.items()}, batch)
    outputs, _ = bundle.module.apply({"params": params}, embs, training=True,
                                     rngs={"dropout": rng_}, mutable=["losses"])
    return outputs["video_id_rank_skip_model"].sum()
timeit("C1. combine + model FWD only", fwd_only, state.params, acts)

@jax.jit
def fwdbwd(params, acts_):
    def lfn(p, a):
        embs = pk.combine_from_acts(
            eng, plans, {s: {"acts": x} for s, x in a.items()}, batch)
        return _model_outputs_and_loss(bundle, p, embs, labels, weight,
                                       None, True, {"dropout": rng_})
    (loss, aux), g = jax.value_and_grad(lfn, (0, 1), has_aux=True)(
        params, acts_)
    return loss
timeit("C2. combine + model FWD+BWD (31.7 nominal)", fwdbwd,
       state.params, acts)

# model alone on a pre-built embs dict (no combine slicing)
embs0 = jax.jit(lambda a: pk.combine_from_acts(
    eng, plans, {s: {"acts": x} for s, x in a.items()}, batch))(acts)
jax.block_until_ready(jax.tree.leaves(embs0))
@jax.jit
def model_fwdbwd(params, embs_):
    def lfn(p, e):
        return _model_outputs_and_loss(bundle, p, e, labels, weight,
                                       None, True, {"dropout": rng_})
    (loss, aux), g = jax.value_and_grad(lfn, (0, 1), has_aux=True)(
        params, embs_)
    return loss
timeit("C3. model FWD+BWD given embs (no combine)", model_fwdbwd,
       state.params, embs0)
