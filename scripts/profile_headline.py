"""Phase-level timing of the headline autoint train step on the real chip.

Isolates: forward gather | fwd+bwd dense | unique | segment-add | per-row
optimizer+scatter | full step, plus raw primitive costs (sort, scatter-add)
at the step's shapes.  Every window ends with a host scalar fetch (this
platform's block_until_ready can return early — see CLAUDE.md).
"""
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
from recommendsystem_tpu.train.step import _model_outputs_and_loss

BATCH = 65536
BUCKET = 265000

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=3):
    out = fn(*args)
    fetch(out)           # compile + warmup
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:10.1f} ms  (fetch={f:.4g})", flush=True)
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

    # 1. forward gather only
    @jax.jit
    def f_gather(w, b):
        raw = eng.gather_raw(w, b)
        return sum(jnp.sum(v) for v in raw.values())
    timeit("gather_raw (fused take)", f_gather, weights, batch)

    raw = jax.jit(lambda w, b: eng.gather_raw(w, b))(weights, batch)
    jax.block_until_ready(raw)

    # 2. fwd+bwd through the dense model given raw activations
    @jax.jit
    def f_fwdbwd(params, raw_):
        def lfn(p, r):
            embs = eng.combine_raw(r, batch)
            return _model_outputs_and_loss(bundle, p, embs, labels, weight,
                                           None, True, {"dropout": rng})
        (loss, aux), (gp, graw) = jax.value_and_grad(lfn, (0, 1), has_aux=True)(
            params, raw_)
        return loss
    timeit("fwd+bwd dense (given raw)", f_fwdbwd, state.params, raw)

    # get real graw for the update phases
    @jax.jit
    def f_graw(params, raw_):
        def lfn(p, r):
            embs = eng.combine_raw(r, batch)
            return _model_outputs_and_loss(bundle, p, embs, labels, weight,
                                           None, True, {"dropout": rng})
        _, (gp, graw) = jax.value_and_grad(lfn, (0, 1), has_aux=True)(params, raw_)
        return graw
    graw = f_graw(state.params, raw)
    jax.block_until_ready(graw)
    flat = jax.jit(lambda g: eng.flatten_raw_grads(g, batch))(graw)
    jax.block_until_ready(flat)
    (skey, (rows, grads, mask)), = flat.items()
    print(f"flat rows: {rows.shape} grads: {grads.shape}", flush=True)

    # 3. full scatter update
    @jax.jit
    def f_scatter(tables, fl):
        new = eng.apply_gradients_scatter(tables, fl)
        return new[skey]["w"][0, 0]
    timeit("apply_gradients_scatter (full)", f_scatter, state.tables, flat)

    n = rows.shape[0]

    # 4. unique alone
    @jax.jit
    def f_unique(r):
        u, inv = jnp.unique(r, return_inverse=True, size=n, fill_value=0)
        return u[-1] + inv[-1]
    timeit("jnp.unique(size=n)", f_unique, rows)

    # 5. raw sort of n keys
    @jax.jit
    def f_sort(r):
        return jax.lax.sort(r)[-1]
    timeit("lax.sort keys", f_sort, rows)

    # 5b. key-value sort (what unique's argsort costs)
    @jax.jit
    def f_sortkv(r):
        k, v = jax.lax.sort((r, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return k[-1] + v[-1]
    timeit("lax.sort key+value", f_sortkv, rows)

    # 6. scatter-add (E,8) into (E,8) with duplicate indices
    u, inv = jax.jit(lambda r: jnp.unique(r, return_inverse=True, size=n,
                                          fill_value=0))(rows)
    jax.block_until_ready((u, inv))
    @jax.jit
    def f_segadd(inv_, g):
        return jnp.zeros((n, g.shape[-1]), g.dtype).at[inv_].add(g)[0, 0]
    timeit("scatter-add (E,8) by inv", f_segadd, inv, grads)

    # 7. scatter-add into the TABLE directly by raw rows (the naive push)
    @jax.jit
    def f_tbladd(r, g):
        return jnp.zeros((eng.storage[skey][0], g.shape[-1]), g.dtype
                         ).at[r].add(g)[0, 0]
    timeit("scatter-add table by raw rows", f_tbladd, rows, grads)

    # 8. gather unique rows + per-row adam + unique-scatter back
    w_t = state.tables[skey]["w"]
    @jax.jit
    def f_rowopt(w, u_, g):
        wr = jnp.take(w, u_, axis=0)
        new = wr - 0.01 * g
        return w.at[u_].add(new - wr, mode="drop", unique_indices=True)[0, 0]
    timeit("take+update+unique-scatter", f_rowopt, w_t, u, grads)

if __name__ == "__main__":
    main()
