"""Packed optimizer state (w/m/v co-located in the scatter packing).

The packed-state layout must be numerically invisible: the one-pass packed
Adam equals SparseAdam.update row-for-row, converters roundtrip exactly,
qualifying rules pick the right layout, and the classic debug paths still
run against packed-state engines through the adapter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendsystem_tpu.embedding import packed
from recommendsystem_tpu.embedding.optimizers import SparseAdam


def _random_classic(rng, rows, d, touched_frac=0.3):
    w = rng.standard_normal((rows, d)).astype(np.float32)
    m = (rng.standard_normal((rows, d)) * 0.01).astype(np.float32)
    v = (np.abs(rng.standard_normal((rows, d))) * 1e-4).astype(np.float32)
    t = rng.integers(0, 50, (rows, 1)).astype(np.float32)
    show = rng.integers(0, 9, (rows, 1)).astype(np.float32)
    G = (rng.standard_normal((rows, d)) * 0.1).astype(np.float32)
    cnt = (rng.random((rows, 1)) < touched_frac).astype(np.float32) * \
        rng.integers(1, 4, (rows, 1))
    return ({"w": jnp.asarray(w),
             "opt": {"m": jnp.asarray(m), "v": jnp.asarray(v),
                     "t": jnp.asarray(t)},
             "show": jnp.asarray(show)},
            jnp.asarray(G), jnp.asarray(cnt))


@pytest.mark.parametrize("d", [8, 12, 16, 32, 48, 96])
def test_pack_unpack_roundtrip(d):
    ps = packed.scatter_pack(d)
    rows = ps * 37
    classic, _, _ = _random_classic(np.random.default_rng(0), rows, d)
    pk = packed.pack_state_entry(classic, d)
    assert packed.is_packed_state(pk)
    assert pk["w"].shape == (rows // ps, 128)
    back = packed.unpack_state_entry(pk, d)
    for path_a, path_b in zip(jax.tree_util.tree_leaves(classic),
                              jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(path_a), np.asarray(path_b))


@pytest.mark.parametrize("d", [8, 48, 96])
def test_packed_adam_matches_classic_update(d):
    """The one-pass packed Adam == SparseAdam.update to the bit (same f32
    op order per lane), including t advance, bias correction, show
    accumulation and untouched-row passthrough."""
    opt = SparseAdam()
    ps = packed.scatter_pack(d)
    rows = ps * 53
    rng = np.random.default_rng(1)
    classic, G, cnt = _random_classic(rng, rows, d)

    row_mask = (cnt > 0).astype(jnp.float32)
    w2, opt2 = jax.jit(opt.update)(classic["w"], G, classic["opt"], row_mask)
    expect = {"w": w2, "opt": opt2, "show": classic["show"] + cnt}

    pk = packed.pack_state_entry(classic, d)
    acc = packed._pack_cols(jnp.where(row_mask > 0, G, 0.0) * 1.0, cnt, d)
    got = jax.jit(lambda s, a: packed.packed_adam_update(opt, s, a, d))(pk, acc)
    back = packed.unpack_state_entry(got, d)

    np.testing.assert_allclose(np.asarray(back["w"]), np.asarray(expect["w"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(back["opt"]["m"]),
                               np.asarray(expect["opt"]["m"]), rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(back["opt"]["v"]),
                               np.asarray(expect["opt"]["v"]), rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(back["opt"]["t"]),
                                  np.asarray(expect["opt"]["t"]))
    np.testing.assert_array_equal(np.asarray(back["show"]),
                                  np.asarray(expect["show"]))


def _engine(bucket, dim, opt=None, **kw):
    from recommendsystem_tpu.embedding import (EmbeddingFeatures,
                                               category_column,
                                               embedding_column)
    cols = [embedding_column(category_column(f"f{i}", bucket), dim,
                             combiner="mean", name=f"c{i}") for i in range(3)]
    return EmbeddingFeatures(cols, opt or SparseAdam(learning_rate=0.01),
                             group_tables=True, **kw)


def test_init_layout_selection():
    from recommendsystem_tpu.embedding.optimizers import SparseAdaGrad
    # Adam + f32 + grouped (aligned) -> packed state
    eng = _engine(1024, 8)
    state = eng.init(jax.random.PRNGKey(0))
    assert all(packed.is_packed_state(t) for t in state.values())
    # AdaGrad -> classic
    eng = _engine(1024, 8, opt=SparseAdaGrad())
    state = eng.init(jax.random.PRNGKey(0))
    assert not any(packed.is_packed_state(t) for t in state.values())
    # bf16 tables -> packed too (w packs bf16; t/show live on the f32
    # moment arrays' spare lanes)
    eng = _engine(1024, 8, table_dtype=jnp.bfloat16)
    state = eng.init(jax.random.PRNGKey(0))
    assert all(packed.is_packed_state(t) for t in state.values())
    assert all(t["w"].dtype == jnp.bfloat16 for t in state.values())
    # bf16 moments -> classic (t rides a lane; bf16 cannot count past 256)
    eng = _engine(1024, 8, opt=SparseAdam(state_dtype=jnp.bfloat16))
    state = eng.init(jax.random.PRNGKey(0))
    assert not any(packed.is_packed_state(t) for t in state.values())
    # opt-out flag
    eng = _engine(1024, 8, packed_state=False)
    state = eng.init(jax.random.PRNGKey(0))
    assert not any(packed.is_packed_state(t) for t in state.values())


def test_packed_state_weights_and_evict():
    """weights() unpacks to (rows, D); evict runs through the adapter and
    preserves the packed layout."""
    eng = _engine(1024, 8)
    state = eng.init(jax.random.PRNGKey(0))
    w = eng.weights(state)
    for skey, arr in w.items():
        rows, d = eng.storage[skey]
        assert arr.shape == (rows, d)
    out = eng.evict(state, min_show=1.0)
    assert all(packed.is_packed_state(t) for t in out.values())
    # all-fresh (show starts at 0): every weight re-drawn but layout intact
    w2 = eng.weights(out)
    for skey in w:
        assert w[skey].shape == w2[skey].shape


def test_unaligned_bucket_stays_classic():
    """Storages whose rows are not Ps-aligned (tiny ungrouped buckets) keep
    the classic layout automatically."""
    from recommendsystem_tpu.embedding import (EmbeddingFeatures,
                                               category_column,
                                               embedding_column)
    cols = [embedding_column(category_column("x", 60), 8, combiner="mean")]
    eng = EmbeddingFeatures(cols, SparseAdam(), group_tables=False,
                            packed=False)
    state = eng.init(jax.random.PRNGKey(0))
    assert not any(packed.is_packed_state(t) for t in state.values())


def test_row_update_variant_matches_lazy():
    """The O(touched-rows) update (sort + segment-sum + gather/update/
    scatter-back) equals the lazy dense pass: same losses, same tables,
    same opt state, untouched rows bit-identical."""
    from recommendsystem_tpu.data import synthetic_batch
    from recommendsystem_tpu.models import create_model
    from recommendsystem_tpu.train import create_train_state
    from recommendsystem_tpu.train.step import make_train_step

    def run(threshold):
        bundle = create_model("autoint", bucket_size=300)
        bundle.embedding.row_update_min_rows = threshold
        batch, dense, labels, weight = synthetic_batch(bundle, 16, seed=0)
        state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
        step = make_train_step(bundle, donate=False, sparse_update="packed")
        losses = []
        for i in range(3):
            state, info = step(state, batch, labels, weight, dense,
                               jax.random.PRNGKey(1))
            losses.append(float(info["loss"]))
        return bundle, state, losses

    b_rows, s_rows, l_rows = run(0)            # force row-update everywhere
    b_lazy, s_lazy, l_lazy = run(1 << 62)      # force lazy everywhere
    np.testing.assert_allclose(l_rows, l_lazy, rtol=1e-6)
    c_rows = jax.device_get(b_rows.embedding.classic_state(s_rows.tables))
    c_lazy = jax.device_get(b_lazy.embedding.classic_state(s_lazy.tables))
    for skey in c_lazy:
        for leaf_r, leaf_l in zip(jax.tree_util.tree_leaves(c_rows[skey]),
                                  jax.tree_util.tree_leaves(c_lazy[skey])):
            np.testing.assert_allclose(leaf_r, leaf_l, rtol=1e-6, atol=1e-7)


def test_row_update_untouched_rows_bit_identical():
    """Row-update mode must leave every untouched physical row's bytes
    EXACTLY unchanged (no lazy passthrough rounding)."""
    from recommendsystem_tpu.data import synthetic_batch
    from recommendsystem_tpu.models import create_model
    from recommendsystem_tpu.train import create_train_state
    from recommendsystem_tpu.train.step import make_train_step

    bundle = create_model("autoint", bucket_size=1024)
    bundle.embedding.row_update_min_rows = 0
    batch, dense, labels, weight = synthetic_batch(bundle, 8, seed=1)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    before = jax.device_get(bundle.embedding.raw_weights(state.tables))
    step = make_train_step(bundle, donate=False, sparse_update="packed")
    state, _ = step(state, batch, labels, weight, dense, jax.random.PRNGKey(2))
    eng = bundle.embedding
    touched = {skey: set() for skey in state.tables}
    for key, col in eng.columns.items():
        skey, off, _ = eng.table_map[col.categorical_column.key]
        ps = packed.scatter_pack(eng.storage[skey][1])
        ids = (np.asarray(batch[key].rows).reshape(-1) + off) // ps
        touched[skey].update(ids.tolist())
    after = jax.device_get(eng.raw_weights(state.tables))
    for skey in before:
        changed = np.nonzero(np.any(after[skey] != before[skey], axis=1))[0]
        assert set(changed.tolist()) <= touched[skey], skey
        assert len(changed) > 0, skey
