"""Phase-level timing of the PACKED headline step (autoint, batch 64k) on
the real chip: isolates stream build, wide gather, fused gather+fold,
dense fwd+bwd, unfold, payload scatter-add, lazy optimizer pass, and
the full step.  Every window ends with a host scalar fetch (block_until_ready
can return early on this platform — CLAUDE.md)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import _model_outputs_and_loss, make_train_step
from recommendsystem_tpu.embedding import packed as pk

BATCH = int(os.environ.get("BATCH", 65536))
BUCKET = 265000

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=3):
    out = fn(*args); fetch(out)
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:10.1f} ms  (fetch={f:.4g})", flush=True)
    return dt

def main():
    print("devices:", jax.devices(), flush=True)
    bundle = create_model("autoint", bucket_size=BUCKET)
    batch, dense, labels, weight = synthetic_batch(bundle, BATCH, seed=0,
                                                   ids_per_feature=5)
    batch = jax.device_put(batch)
    labels = jax.device_put(labels)
    weight = jax.device_put(weight)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)
    eng = bundle.embedding
    weights = eng.weights(state.tables)
    pk_st, _ = pk.storages_packed(eng)
    plans = pk.plan_segments(eng, batch, storages=set(pk_st))
    print("storages:", {s: eng.storage[s] for s in plans}, flush=True)
    E = sum(sum(seg.size for seg in segs) for segs in plans.values())
    print("total stream rows E =", E, flush=True)

    # 0. full packed step
    step = make_train_step(bundle, donate=False, sparse_update="packed")
    timeit("FULL packed step", lambda: step(state, batch, labels, weight,
                                            None, rng)[1]["loss"])

    # 1. stream build only
    @jax.jit
    def f_stream(b):
        tot = jnp.float32(0)
        for skey, segs in plans.items():
            ids, mask = pk.storage_stream(eng, skey, segs, b)
            tot += ids[-1] + mask[-1]
        return tot
    timeit("storage_stream (ids/mask concat)", f_stream, batch)

    # 2. + packed wide gather
    @jax.jit
    def f_take(w, b):
        tot = jnp.float32(0)
        for skey, segs in plans.items():
            d = eng.storage[skey][1]
            pg = pk.gather_pack(d)
            ids, mask = pk.storage_stream(eng, skey, segs, b)
            wp = pk.pack_table(w[skey].astype(jnp.float32))
            wide = jnp.take(wp, ids // pg, axis=0)
            tot += wide[-1, -1]
        return tot
    timeit("stream + pack + wide take (E,128)", f_take, weights, batch)

    # 3. full gather_fold (stream + fused take/select/fold)
    @jax.jit
    def f_fold(w, b):
        ctx = pk.gather_fold(eng, w, b, plans)
        return sum(jnp.sum(a) for c in ctx.values() for a in c["acts"])
    timeit("gather_fold (all fwd stages)", f_fold, weights, batch)

    ctx = jax.jit(lambda w, b: pk.gather_fold(eng, w, b, plans))(weights, batch)
    jax.block_until_ready(jax.tree.leaves(ctx))
    acts = {skey: c["acts"] for skey, c in ctx.items()}

    # 5. dense fwd+bwd given folded acts
    @jax.jit
    def f_fwdbwd(params, acts_):
        def lfn(p, a):
            embs = pk.combine_from_acts(
                eng, plans, {s: {"acts": x} for s, x in a.items()}, batch)
            return _model_outputs_and_loss(bundle, p, embs, labels, weight,
                                           None, True, {"dropout": rng})
        (loss, aux), g = jax.value_and_grad(lfn, (0, 1), has_aux=True)(
            params, acts_)
        return loss
    timeit("dense fwd+bwd (given acts)", f_fwdbwd, state.params, acts)

    @jax.jit
    def f_gacts(params, acts_):
        def lfn(p, a):
            embs = pk.combine_from_acts(
                eng, plans, {s: {"acts": x} for s, x in a.items()}, batch)
            return _model_outputs_and_loss(bundle, p, embs, labels, weight,
                                           None, True, {"dropout": rng})
        _, (gp, ga) = jax.value_and_grad(lfn, (0, 1), has_aux=True)(params, acts_)
        return ga
    g_acts = f_gacts(state.params, acts)
    jax.block_until_ready(jax.tree.leaves(g_acts))

    # 6. unfold only
    @jax.jit
    def f_unfold(g_acts_, ctx_):
        tot = jnp.float32(0)
        for skey, segs in plans.items():
            ids_, mask_ = ctx_[skey]["ids"], ctx_[skey]["mask"]
            for seg, g in zip(segs, g_acts_[skey]):
                i_seg = ids_[seg.start:seg.start + seg.size]
                m_seg = mask_[seg.start:seg.start + seg.size]
                d = g.shape[-1]
                if seg.kind == "mean":
                    p = pk.unfold_mean(g, i_seg, m_seg, len(seg.keys), seg.l)
                else:
                    p = pk.unfold_rows(g.reshape(seg.size, d), i_seg, m_seg)
                tot += p[-1, -1]
        return tot
    timeit("unfold only", f_unfold, g_acts, ctx)

    # 7. full update (unfold + per-table scatter + dense opt pass)
    @jax.jit
    def f_update(tables, g_acts_, ctx_):
        new = pk.apply_gradients_packed(eng, tables, g_acts_, plans, ctx_, batch)
        return sum(t["w"][0, 0] for t in new.values())
    timeit("apply_gradients_packed (full)", f_update, state.tables, g_acts, ctx)

    # 8. dense optimizer pass alone (zero acc/G; handles both the round-5
    # packed-state layout and classic storages)
    @jax.jit
    def f_opt(tables):
        tot = jnp.float32(0)
        for skey, tstate in tables.items():
            if pk.is_packed_state(tstate):
                d = eng.storage[skey][1]
                acc = jnp.zeros_like(tstate["w"], dtype=jnp.float32)
                new = pk.packed_adam_update(eng.sparse_opt, tstate, acc, d)
                tot += new["w"][0, 0].astype(jnp.float32)
            else:
                rows, d = tstate["w"].shape
                G = jnp.zeros((rows, d), jnp.float32)
                cnt = jnp.zeros((rows, 1), jnp.float32)
                w, opt = eng.sparse_opt.update(
                    tstate["w"].astype(jnp.float32), G, tstate["opt"],
                    (cnt > 0).astype(jnp.float32))
                tot += w[0, 0]
        return tot
    timeit("lazy optimizer pass (all tables)", f_opt, state.tables)

    # 9. payload scatter-add alone, one storage, real shapes
    skey0 = next(iter(plans))
    d0 = eng.storage[skey0][1]
    ps0 = pk.scatter_pack(d0)
    ids0, _ = jax.jit(lambda b: pk.storage_stream(eng, skey0, plans[skey0], b))(batch)
    e0 = ids0.shape[0]
    pay0 = jax.random.normal(jax.random.PRNGKey(2), (e0, 128), jnp.float32)
    members = eng._storage_members(skey0)
    jax.block_until_ready((ids0, pay0))
    @jax.jit
    def f_scat(ids_, pay_):
        tot = jnp.float32(0)
        spans = pk.table_spans(eng, plans[skey0], batch)
        for off, tkey, rows_t in members:
            np_t = -(-rows_t // ps0)
            t_ids = jnp.concatenate([ids_[s:s + n] for s, n in spans[tkey]])
            t_pay = jnp.concatenate([pay_[s:s + n] for s, n in spans[tkey]])
            phys = (t_ids - off) // ps0
            acc = jnp.zeros((np_t, 128), jnp.float32)
            acc = acc.at[phys].add(t_pay, mode="drop")
            tot += acc[0, 0]
        return tot
    timeit(f"payload scatter-add ({skey0}, E={e0})", f_scat, ids0, pay0)

if __name__ == "__main__":
    main()
