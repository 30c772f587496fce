"""Distribution correctness: a FULL train step on the 8-device mesh
(row-sharded tables + all-to-all lookup + data-parallel dense) must be
numerically equivalent to the single-device local path — the sharded design
is a pure re-layout, not a different algorithm (SURVEY §7 step 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state, state_shardings
from recommendsystem_tpu.train.step import make_train_step


def place(mesh, bundle, state, batch, labels, weight):
    sh = state_shardings(bundle, state, mesh)
    data = NamedSharding(mesh, P("data"))
    return (jax.device_put(state, sh),
            jax.device_put(batch, jax.tree.map(lambda _: data, batch)),
            jax.device_put(labels, jax.tree.map(lambda _: data, labels)),
            jax.device_put(weight, data))


@pytest.mark.parametrize("sparse_update", ["scatter", "dense"])
@pytest.mark.parametrize("model", ["autoint", "ctr"])
def test_sharded_step_matches_local(mesh8, model, sparse_update):
    n = 8
    bundle = create_model(model, bucket_size=64 * n, num_shards=n)
    batch, dense, labels, weight = synthetic_batch(bundle, 4 * n, seed=0)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)

    rng = jax.random.PRNGKey(7)
    local_step = make_train_step(bundle, donate=False)
    local_state, local_info = local_step(state, batch, labels, weight, None, rng)

    s_state, s_batch, s_labels, s_weight = place(mesh8, bundle, state, batch,
                                                 labels, weight)
    sharded_step = make_train_step(bundle, mesh=mesh8, mode="sharded",
                                   donate=False, sparse_update=sparse_update)
    sh_state, sh_info = sharded_step(s_state, s_batch, s_labels, s_weight,
                                     None, rng)

    np.testing.assert_allclose(float(sh_info["loss"]), float(local_info["loss"]),
                               rtol=1e-5)
    # dense params identical after one step
    key = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(local_state.params), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(sh_state.params), key=key)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5, err_msg=str(ka))
    # sparse tables identical (row-sharded result gathered back); compared
    # through the classic-layout view so packed-state storages normalize
    c_local = jax.device_get(bundle.embedding.classic_state(local_state.tables))
    c_sh = jax.device_get(bundle.embedding.classic_state(sh_state.tables))
    for tkey in c_local:
        np.testing.assert_allclose(
            c_sh[tkey]["w"], c_local[tkey]["w"],
            rtol=5e-4, atol=1e-6, err_msg=tkey)
        np.testing.assert_allclose(
            c_sh[tkey]["show"], c_local[tkey]["show"], err_msg=tkey)
        # per-row optimizer state identical too (the routed PS-push applies
        # the same per-row math as the local scatter)
        for (pa, a), (pb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(
                    c_local[tkey]["opt"]), key=lambda kv: str(kv[0])),
                sorted(jax.tree_util.tree_leaves_with_path(
                    c_sh[tkey]["opt"]), key=lambda kv: str(kv[0]))):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-6,
                                       err_msg=f"{tkey}{pa}")


def test_sharded_scatter_large_table_touches_only_batch_rows(mesh8):
    """The sharded scatter path at a realistic table size (2^20 rows): only
    the batch's rows move, untouched rows (and their opt state) are
    bit-identical — the O(batch) PS-push contract, which the O(table) dense
    fallback could not honor (VERDICT round-1 missing #1)."""
    n = 8
    rows_total = 1 << 20
    bundle = create_model("autoint", bucket_size=rows_total, num_shards=n)
    batch, dense, labels, weight = synthetic_batch(bundle, 4 * n, seed=3)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    before = jax.device_get(bundle.embedding.classic_state(state.tables))

    s_state, s_batch, s_labels, s_weight = place(mesh8, bundle, state, batch,
                                                 labels, weight)
    step = make_train_step(bundle, mesh=mesh8, mode="sharded", donate=False,
                           sparse_update="scatter")
    sh_state, info = step(s_state, s_batch, s_labels, s_weight, None,
                          jax.random.PRNGKey(7))
    assert np.isfinite(float(info["loss"]))

    touched = {tkey: set() for tkey in state.tables}
    for key, col in bundle.embedding.columns.items():
        if key not in batch:
            continue
        skey, offset, _ = bundle.embedding.table_map[
            col.categorical_column.key]
        ids = np.asarray(batch[key].rows).reshape(-1) + offset
        touched[skey].update(ids.tolist())

    c_after = jax.device_get(bundle.embedding.classic_state(sh_state.tables))
    for tkey, tstate in c_after.items():
        w_after = np.asarray(tstate["w"])
        w_before = before[tkey]["w"]
        changed = np.nonzero(np.any(w_after != w_before, axis=1))[0]
        assert set(changed.tolist()) <= touched[tkey], tkey
        assert len(changed) > 0, f"{tkey}: no rows updated"
        untouched = np.setdiff1d(
            np.arange(rows_total), np.fromiter(touched[tkey], dtype=np.int64))
        sample = untouched[:: max(1, len(untouched) // 1024)]
        np.testing.assert_array_equal(w_after[sample], w_before[sample])
        show_after = np.asarray(tstate["show"])[:, 0]
        assert np.all(show_after[sample] == before[tkey]["show"][sample, 0])


def test_multi_step_sharded_training_converges(mesh8):
    """Several sharded steps in a row keep shardings stable and reduce loss."""
    n = 8
    bundle = create_model("autoint", bucket_size=64 * n, num_shards=n,
                          sparse_lr=5e-2, dense_lr=1e-2)
    batch, dense, labels, weight = synthetic_batch(bundle, 8 * n, seed=0)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    state, batch_p, labels_p, weight_p = place(mesh8, bundle, state, batch,
                                               labels, weight)
    step = make_train_step(bundle, mesh=mesh8, mode="sharded", donate=False)
    losses = []
    for i in range(10):
        b, d, l, w = synthetic_batch(bundle, 8 * n, seed=i)
        data = NamedSharding(mesh8, P("data"))
        b = jax.device_put(b, jax.tree.map(lambda _: data, b))
        l = jax.device_put(l, jax.tree.map(lambda _: data, l))
        w = jax.device_put(w, data)
        state, info = step(state, b, l, w, None, jax.random.PRNGKey(i))
        losses.append(float(info["loss"]))
    assert losses[-1] < losses[0]
    tkey = next(iter(state.tables))
    assert state.tables[tkey]["w"].sharding.spec[0] == "data"
