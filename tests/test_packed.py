"""Lane-packed embedding path (embedding/packed.py): plan/layout unit tests
and train-step parity vs the classic scatter and dense paths.

On TPU the fold/unfold stages run Pallas kernels; on CPU (this suite's
default 8-device mesh) they fall back to the pure-jnp ``*_ref``
implementations — same math and layouts, different code.  CPU tests
therefore pin the pipeline shape and the *_ref numerics;
``test_tpu_kernels_match_reference`` below runs the real kernels against the
refs when the suite executes on a TPU backend (also run each round as
``scripts/onchip_packed_parity.py``, recorded in ``ONCHIP_PARITY.json``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.embedding import packed
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

def test_pack_constants():
    assert packed.gather_pack(8) == 16
    assert packed.scatter_pack(8) == 14      # 128 // 9
    assert packed.packable(8)
    assert packed.packable(16)
    assert packed.packable(42)
    # wide dims degenerate to >=1 row per physical row but still pack
    assert packed.gather_pack(96) == 1 and packed.scatter_pack(96) == 1
    assert packed.packable(96)
    assert packed.packable(127)
    assert not packed.packable(128)          # grad+count needs d+1 lanes


def test_engine_alignment():
    bundle = create_model("autoint", bucket_size=200)
    eng = bundle.embedding
    pg, ps = packed.gather_pack(8), packed.scatter_pack(8)
    for skey, (rows, d) in eng.storage.items():
        assert rows % pg == 0
        for off, _, rows_t in eng._storage_members(skey):
            assert off % pg == 0 and off % ps == 0
    pk, classic = packed.storages_packed(eng)
    assert pk, "autoint (d=8 fp32) storages must be packable"
    assert not classic


def test_max_group_bytes_splits_groups():
    bundle = create_model("autoint", bucket_size=100_000)
    eng = bundle.embedding
    # 24 tables of 100016x8 fp32 = 3.2 MB each; autoint's measured-best
    # 10 MB cap (prefetchable storages, scripts/probe25.py) -> 3 per group
    assert len(eng.storage) == 8
    for skey, (rows, d) in eng.storage.items():
        assert rows * d * 4 <= eng.max_group_bytes


def test_fold_unfold_reference_roundtrip():
    """fold_mean / unfold_mean against a direct per-id computation.  Mean
    streams are l-major per column (c=2 columns here): the stream position of
    (column ci, slot j, row b) is ci*l*b_rows + j*b_rows + b."""
    rng = np.random.default_rng(0)
    d, l, c, b = 8, 5, 2, 32
    x = c * b
    pg, dp = packed.gather_pack(d), d + 1
    e = x * l
    rows = 1008                              # multiple of pg and ps
    ids = rng.integers(0, rows, e).astype(np.int32)
    mask = (rng.random(e) > 0.3).astype(np.float32)
    w = rng.normal(size=(rows, d)).astype(np.float32)
    wp = packed.pack_table(jnp.asarray(w))
    wide = jnp.take(wp, jnp.asarray(ids) // pg, axis=0)

    out = np.asarray(packed.fold_mean(wide, jnp.asarray(ids),
                                      jnp.asarray(mask), c, l, d))
    # direct: table row id, masked, summed over each row's L slots (l-major:
    # slot j of logical row (ci, b) sits at stream row ci*l*b + j*b + b)
    sel = w[ids] * mask[:, None]
    ref_sum = sel.reshape(c, l, b, d).sum(1).reshape(x, d)
    np.testing.assert_allclose(out, ref_sum, atol=1e-5)

    seq = np.asarray(packed.fold_rows(wide, jnp.asarray(ids),
                                      jnp.asarray(mask), d))
    np.testing.assert_allclose(seq, sel, atol=1e-5)

    gx = rng.normal(size=(x, d)).astype(np.float32)
    pay = np.asarray(packed.unfold_mean(jnp.asarray(gx), jnp.asarray(ids),
                                        jnp.asarray(mask), c, l))
    ps = packed.scatter_pack(d)
    ref = np.zeros((e, 128), np.float32)
    # l-major: stream row index -> logical row ci*b + b0
    xs = (np.arange(e) // (l * b)) * b + (np.arange(e) % b)
    for j in range(d):
        ref[np.arange(e), (ids % ps) * dp + j] = gx[xs, j] * mask
    ref[np.arange(e), (ids % ps) * dp + d] += mask
    np.testing.assert_allclose(pay, ref, atol=1e-5)

    gr = rng.normal(size=(e, d)).astype(np.float32)
    pay_r = np.asarray(packed.unfold_rows(jnp.asarray(gr), jnp.asarray(ids),
                                          jnp.asarray(mask)))
    ref_r = np.zeros((e, 128), np.float32)
    for j in range(d):
        ref_r[np.arange(e), (ids % ps) * dp + j] = gr[:, j] * mask
    ref_r[np.arange(e), (ids % ps) * dp + d] += mask
    np.testing.assert_allclose(pay_r, ref_r, atol=1e-5)


def test_plan_covers_all_columns():
    bundle = create_model("staytime")
    eng = bundle.embedding
    batch, _, _, _ = synthetic_batch(bundle, 8, seed=0)
    pk, _ = packed.storages_packed(eng)
    plans = packed.plan_segments(eng, batch, storages=set(pk))
    planned = {k for segs in plans.values() for s in segs for k in s.keys}
    classic = {k for k in batch
               if eng.table_map[eng.columns[k].categorical_column.key][0]
               not in plans}
    assert planned | classic == set(batch.keys())
    assert not planned & classic
    # segment sizes tile each storage's stream exactly
    for skey, segs in plans.items():
        off = 0
        for s in segs:
            assert s.start == off
            off += s.size
        ids, mask = packed.storage_stream(eng, skey, segs, batch)
        assert ids.shape[0] == off == mask.shape[0]


def test_table_spans_partition_stream():
    bundle = create_model("autoint", bucket_size=300)
    eng = bundle.embedding
    batch, _, _, _ = synthetic_batch(bundle, 4, seed=0)
    pk, _ = packed.storages_packed(eng)
    plans = packed.plan_segments(eng, batch, storages=set(pk))
    for skey, segs in plans.items():
        spans = packed.table_spans(eng, segs, batch)
        total = sum(s.size for s in segs)
        covered = np.zeros(total, bool)
        ids, _ = packed.storage_stream(eng, skey, segs, batch)
        ids = np.asarray(ids)
        for tkey, sp in spans.items():
            _, off, rows_t = eng.table_map[tkey]
            for start, size in sp:
                assert not covered[start:start + size].any()
                covered[start:start + size] = True
                seg_ids = ids[start:start + size]
                assert (seg_ids >= off).all() and (seg_ids < off + rows_t).all()
        assert covered.all()


# ---------------------------------------------------------------------------
# train-step parity: packed == scatter == dense
# ---------------------------------------------------------------------------

def _cs(bundle, state):
    """Classic-layout view of the table state (packed-state storages unpack)
    so parity comparisons are layout-independent."""
    return jax.device_get(bundle.embedding.classic_state(state.tables))


def _run(bundle, sparse_update, batch, labels, weight, dense, steps=3):
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch, dense)
    step = make_train_step(bundle, donate=False, sparse_update=sparse_update)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(steps):
        state, info = step(state, batch, labels, weight, dense, rng)
        losses.append(float(info["loss"]))
    return state, losses


@pytest.mark.parametrize("name,kwargs", [
    ("autoint", {"bucket_size": 250}),
    ("staytime", {}),                       # seq columns + AdaGrad + FFM dims
    ("finish", {"bucket_size": 300}),
    ("ctr", {"bucket_size": 250}),          # d=48: Pg=2/Ps=2 packing
])
def test_packed_step_matches_scatter(name, kwargs):
    bundle = create_model(name, **kwargs)
    batch, dense, labels, weight = synthetic_batch(bundle, 16, seed=0)
    s_pk, l_pk = _run(bundle, "packed", batch, labels, weight, dense)
    s_sc, l_sc = _run(bundle, "scatter", batch, labels, weight, dense)
    np.testing.assert_allclose(l_pk, l_sc, rtol=1e-5)
    c_pk, c_sc = _cs(bundle, s_pk), _cs(bundle, s_sc)
    for skey in c_sc:
        np.testing.assert_allclose(c_pk[skey]["w"], c_sc[skey]["w"],
                                   atol=1e-5, err_msg=skey)
        np.testing.assert_array_equal(c_pk[skey]["show"], c_sc[skey]["show"],
                                      err_msg=skey)
    for a, b in zip(jax.tree.leaves(s_pk.params), jax.tree.leaves(s_sc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_step_matches_dense():
    bundle = create_model("autoint", bucket_size=250)
    batch, dense, labels, weight = synthetic_batch(bundle, 16, seed=0)
    s_pk, l_pk = _run(bundle, "packed", batch, labels, weight, dense)
    s_de, l_de = _run(bundle, "dense", batch, labels, weight, dense)
    np.testing.assert_allclose(l_pk, l_de, rtol=1e-5)
    c_pk, c_de = _cs(bundle, s_pk), _cs(bundle, s_de)
    for skey in c_de:
        np.testing.assert_allclose(c_pk[skey]["w"], c_de[skey]["w"],
                                   atol=1e-5, err_msg=skey)


def test_packed_with_split_groups_matches_scatter():
    """Parity holds when max_group_bytes splits the shape class into
    multiple storages (different keys, offsets, gather targets)."""
    bundle = create_model("autoint", bucket_size=100_000)
    assert len(bundle.embedding.storage) > 1
    batch, dense, labels, weight = synthetic_batch(bundle, 16, seed=0)
    s_pk, l_pk = _run(bundle, "packed", batch, labels, weight, dense, steps=2)
    s_sc, l_sc = _run(bundle, "scatter", batch, labels, weight, dense, steps=2)
    np.testing.assert_allclose(l_pk, l_sc, rtol=1e-5)
    for skey in s_sc.tables:
        np.testing.assert_allclose(np.asarray(s_pk.tables[skey]["w"]),
                                   np.asarray(s_sc.tables[skey]["w"]),
                                   atol=1e-5, err_msg=skey)


def test_bf16_tables_pack_and_match_scatter():
    """bf16 table storage goes through the packed path (bf16 lanes, f32
    fold accumulation) and matches the classic scatter path exactly — both
    round-trip weights through the same f32 update -> bf16 store."""
    bundle = create_model("autoint", bucket_size=250,
                          table_dtype=jnp.bfloat16)
    pk, classic = packed.storages_packed(bundle.embedding)
    assert pk and not classic
    batch, dense, labels, weight = synthetic_batch(bundle, 16, seed=0)
    s_pk, l_pk = _run(bundle, "packed", batch, labels, weight, dense, steps=2)
    s_sc, l_sc = _run(bundle, "scatter", batch, labels, weight, dense, steps=2)
    np.testing.assert_allclose(l_pk, l_sc, rtol=1e-5)
    for skey in s_sc.tables:
        assert s_pk.tables[skey]["w"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(s_pk.tables[skey]["w"]),
            np.asarray(s_sc.tables[skey]["w"]), err_msg=skey)


def test_wide_dims_pack_production_ctr():
    """The REAL production config's 96-wide shared rows (one row per
    physical row on both packings) run the packed path with scatter
    parity."""
    from recommendsystem_tpu.models.ctr import production_ctr
    bundle = production_ctr(
        "/root/reference/rank/ctr/model_parameter.json", bucket_size=1024)
    pk, classic = packed.storages_packed(bundle.embedding)
    assert pk and not classic, (pk, classic)
    assert {bundle.embedding.storage[s][1] for s in pk} == {96}
    batch, dense, labels, weight = synthetic_batch(bundle, 8, seed=0,
                                                   ids_per_feature=2)
    s_pk, l_pk = _run(bundle, "packed", batch, labels, weight, dense, steps=2)
    s_sc, l_sc = _run(bundle, "scatter", batch, labels, weight, dense, steps=2)
    np.testing.assert_allclose(l_pk, l_sc, rtol=1e-5)
    c_pk, c_sc = _cs(bundle, s_pk), _cs(bundle, s_sc)
    for skey in c_sc:
        np.testing.assert_allclose(c_pk[skey]["w"], c_sc[skey]["w"],
                                   atol=1e-5, err_msg=skey)
        np.testing.assert_array_equal(c_pk[skey]["show"], c_sc[skey]["show"],
                                      err_msg=skey)


def test_unpackable_dims_fall_back_to_classic():
    """Dims whose [grad | count] group exceeds 128 lanes (d > 127) stay on
    the classic path; a mixed engine routes them transparently while the
    rest packs."""
    from recommendsystem_tpu.embedding.feature_column import (
        category_column, embedding_column)
    from recommendsystem_tpu.embedding.engine import EmbeddingFeatures
    from recommendsystem_tpu.embedding.optimizers import SparseAdam

    cols = [embedding_column(category_column("slot_1", bucket_size=224), 8),
            embedding_column(category_column("slot_2", bucket_size=224), 160)]
    eng = EmbeddingFeatures(cols, SparseAdam(), group_tables=True)
    pk, classic = packed.storages_packed(eng)
    d_of = {s: eng.storage[s][1] for s in eng.storage}
    assert {d_of[s] for s in pk} == {8}
    assert {d_of[s] for s in classic} == {160}


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernels run only on TPU; CPU uses _ref")
@pytest.mark.parametrize("c,l,d,b", [(4, 5, 8, 1024), (1, 1, 8, 8192),
                                     (2, 3, 16, 1024), (1, 2, 32, 5000),
                                     (3, 7, 8, 713)])
def test_tpu_kernels_match_reference(c, l, d, b):
    """Mosaic fold/unfold kernels vs the jnp reference on the real chip
    (odd b falls back to _ref inside the kernel wrappers — still parity)."""
    rng = np.random.default_rng(0)
    x = c * b
    e = x * l
    ids = jnp.asarray(rng.integers(0, 1 << 20, size=e).astype(np.int32))
    mask = jnp.asarray((rng.random(e) > 0.3).astype(np.float32))
    wide = jnp.asarray(rng.standard_normal((e, 128)), jnp.float32)
    gx = jnp.asarray(rng.standard_normal((x, d)), jnp.float32)
    g_rows = jnp.asarray(rng.standard_normal((e, d)), jnp.float32)
    pairs = [
        (packed.fold_mean(wide, ids, mask, c, l, d),
         packed.fold_mean_ref(wide, ids, mask, c, l, d)),
        (packed.unfold_mean(gx, ids, mask, c, l),
         packed.unfold_mean_ref(gx, ids, mask, c, l)),
        (packed.fold_rows(wide, ids, mask, d),
         packed.fold_rows_ref(wide, ids, mask, d)),
        (packed.unfold_rows(g_rows, ids, mask),
         packed.unfold_rows_ref(g_rows, ids, mask)),
    ]
    for got, ref in pairs:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


@pytest.mark.parametrize("model,kwargs", [
    ("autoint", {"bucket_size": 64 * 8}),
    ("staytime", {}),                    # seq columns through the exchange
])
def test_packed_sharded_matches_local(mesh8, model, kwargs):
    """Packed-sharded (packed rows over the all-to-all, payload push to
    owner shards) == packed-local == scatter-sharded, to optimizer-state
    precision — the sharded packed path is a re-layout, not a different
    algorithm."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from recommendsystem_tpu.train import state_shardings

    n = 8
    bundle = create_model(model, num_shards=n, **kwargs)
    batch, dense, labels, weight = synthetic_batch(bundle, 4 * n, seed=0)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(7)

    local_step = make_train_step(bundle, donate=False, sparse_update="packed")
    l_state, l_info = local_step(state, batch, labels, weight, None, rng)

    sh = state_shardings(bundle, state, mesh8)
    data = NamedSharding(mesh8, P("data"))
    s_state = jax.device_put(state, sh)
    s_batch = jax.device_put(batch, jax.tree.map(lambda _: data, batch))
    s_labels = jax.device_put(labels, jax.tree.map(lambda _: data, labels))
    s_weight = jax.device_put(weight, data)

    for su in ("packed", "scatter"):
        step = make_train_step(bundle, mesh=mesh8, mode="sharded",
                               donate=False, sparse_update=su)
        st, info = step(s_state, s_batch, s_labels, s_weight, None, rng)
        np.testing.assert_allclose(float(info["loss"]),
                                   float(l_info["loss"]), rtol=1e-5,
                                   err_msg=su)
        c_st, c_l = _cs(bundle, st), _cs(bundle, l_state)
        for skey in c_l:
            np.testing.assert_allclose(
                c_st[skey]["w"], c_l[skey]["w"], atol=1e-5,
                err_msg=f"{su}:{skey}")
            np.testing.assert_array_equal(
                c_st[skey]["show"], c_l[skey]["show"],
                err_msg=f"{su}:{skey}")


def test_lookup_packed_matches_classic():
    bundle = create_model("staytime")
    eng = bundle.embedding
    batch, _, _, _ = synthetic_batch(bundle, 8, seed=3)
    state = eng.init(jax.random.PRNGKey(2))
    w = eng.weights(state)
    classic = eng.lookup(w, batch, mode="local")
    pk = packed.lookup_packed(eng, w, batch)
    assert set(pk) == set(classic)
    for k in classic:
        if isinstance(classic[k], tuple):
            np.testing.assert_allclose(np.asarray(pk[k][0]),
                                       np.asarray(classic[k][0]), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(pk[k][1]),
                                          np.asarray(classic[k][1]))
        else:
            np.testing.assert_allclose(np.asarray(pk[k]),
                                       np.asarray(classic[k]), atol=1e-6,
                                       err_msg=k)
