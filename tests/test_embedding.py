"""Embedding engine tests: hashing, combiners, lazy sparse updates, and the
sharded all-to-all lookup vs the local path (numerics + gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from recommendsystem_tpu.embedding import (
    EmbeddingFeatures,
    IdBatch,
    SparseAdaGrad,
    SparseAdam,
    all_to_all_lookup,
    category_column,
    embedding_column,
)


def make_engine(bucket=64, dim=8, seq=False, opt=None, num_shards=1):
    cat = category_column("f1", bucket)
    cols = [embedding_column(cat, dim, combiner="mean")]
    if seq:
        cols.append(embedding_column(cat, dim, combiner=None, seq_max_len=6,
                                     name="seq_f1"))
    # classic state layout: these are unit tests of the classic (rows, D)
    # semantics with direct row surgery; the packed-state layout has its own
    # suites (test_packed_state, test_packed)
    eng = EmbeddingFeatures(cols, opt or SparseAdam(learning_rate=0.01),
                            num_shards=num_shards, packed_state=False)
    return eng


class TestCategoryColumn:
    def test_hash_range_and_determinism(self):
        cat = category_column("x", 1000)
        ids = np.array([0, 1, 2**62, -5, 123456789], dtype=np.int64)
        h1, h2 = cat.hash_ids(ids), cat.hash_ids(ids)
        np.testing.assert_array_equal(h1, h2)
        assert h1.dtype == np.int32
        assert ((h1 >= 0) & (h1 < 1000)).all()
        # different inputs should (overwhelmingly) hash differently
        assert len(set(h1.tolist())) == len(ids)


class TestLookup:
    def test_mean_combiner_matches_numpy(self):
        eng = make_engine()
        state = eng.init(jax.random.PRNGKey(0))
        rows = jnp.array([[1, 2, 3, 0], [5, 5, 0, 0]], jnp.int32)
        mask = jnp.array([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.float32)
        out = eng.lookup(eng.weights(state), {"f1": IdBatch(rows, mask)})
        w = np.asarray(state["f1"]["w"])
        expect0 = (w[1] + w[2] + w[3]) / 3
        expect1 = (w[5] + w[5]) / 2
        np.testing.assert_allclose(np.asarray(out["f1"][0]), expect0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["f1"][1]), expect1, rtol=1e-6)

    def test_empty_row_gives_zeros(self):
        eng = make_engine()
        state = eng.init(jax.random.PRNGKey(0))
        rows = jnp.zeros((1, 4), jnp.int32)
        mask = jnp.zeros((1, 4), jnp.float32)
        out = eng.lookup(eng.weights(state), {"f1": IdBatch(rows, mask)})
        np.testing.assert_allclose(np.asarray(out["f1"]), 0.0)

    def test_sequence_column_returns_emb_and_mask(self):
        eng = make_engine(seq=True)
        state = eng.init(jax.random.PRNGKey(0))
        rows = jnp.array([[4, 7, 0, 0, 0, 0]], jnp.int32)
        mask = jnp.array([[1, 1, 0, 0, 0, 0]], jnp.float32)
        batch = {"f1": IdBatch(rows, mask), "seq_f1": IdBatch(rows, mask)}
        out = eng.lookup(eng.weights(state), batch)
        emb3d, m = out["seq_f1"]
        assert emb3d.shape == (1, 6, 8) and m.dtype == bool
        w = np.asarray(state["f1"]["w"])
        np.testing.assert_allclose(np.asarray(emb3d[0, 0]), w[4], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(emb3d[0, 2]), 0.0)  # masked zeroed


class TestSparseOptimizers:
    def _one_step(self, opt):
        eng = make_engine(opt=opt)
        state = eng.init(jax.random.PRNGKey(0))
        rows = jnp.array([[3, 9]], jnp.int32)
        mask = jnp.ones((1, 2), jnp.float32)
        batch = {"f1": IdBatch(rows, mask)}

        def loss(weights):
            out = eng.lookup(weights, batch)
            return jnp.sum(out["f1"] ** 2)

        grads = jax.grad(loss)(eng.weights(state))
        counts = eng.row_counts(batch)
        new = eng.apply_gradients(state, grads, counts)
        return state, new

    @pytest.mark.parametrize("opt", [SparseAdam(learning_rate=0.01),
                                     SparseAdaGrad(learning_rate=0.01)])
    def test_lazy_rows(self, opt):
        state, new = self._one_step(opt)
        w0, w1 = np.asarray(state["f1"]["w"]), np.asarray(new["f1"]["w"])
        changed = np.abs(w1 - w0).sum(axis=1) > 0
        assert changed[3] and changed[9]
        assert changed.sum() == 2          # every other row untouched
        assert float(new["f1"]["show"][3, 0]) == 1.0
        assert float(new["f1"]["show"][0, 0]) == 0.0

    def test_adam_per_row_step_counter(self):
        state, new = self._one_step(SparseAdam(learning_rate=0.01))
        t = np.asarray(new["f1"]["opt"]["t"])
        assert t[3, 0] == 1.0 and t[0, 0] == 0.0

    def test_evict(self):
        eng = make_engine(opt=SparseAdaGrad())
        state = eng.init(jax.random.PRNGKey(0))
        state["f1"]["show"] = state["f1"]["show"].at[5].set(10.0)
        out = eng.evict(state, min_show=1.0, rng=jax.random.PRNGKey(3))
        w = np.asarray(out["f1"]["w"])
        w0 = np.asarray(state["f1"]["w"])
        np.testing.assert_array_equal(w[5], w0[5])       # survivor untouched
        assert np.any(w[6] != w0[6])                     # evicted re-drawn...
        assert np.abs(w[6]).sum() > 0                    # ...not zeroed

    def test_evicted_row_resurrects_as_fresh(self):
        """An evict-then-retouch row must be statistically indistinguishable
        from a fresh row: initial_scale uniform re-init, g2sum back to
        initial_g2sum, show 0 — so its first post-evict update takes the same
        step a brand-new feasign would (VERDICT r1 weak #5)."""
        opt = SparseAdaGrad(initial_g2sum=0.1, initial_scale=0.1)
        eng = make_engine(opt=opt)
        state = eng.init(jax.random.PRNGKey(0))
        # train a few rows so their g2sum/show move
        rows = jnp.array([[6, 6, 6, 6]], jnp.int32)
        mask = jnp.ones((1, 4), jnp.float32)
        batch = {"f1": __import__("recommendsystem_tpu.embedding.engine",
                                  fromlist=["IdBatch"]).IdBatch(rows, mask)}
        raw = eng.gather_raw(eng.weights(state), batch)
        graw = jax.grad(lambda r: jnp.sum(eng.combine_raw(r, batch)["f1"] ** 2))(raw)
        state = eng.apply_gradients_scatter(
            state, eng.flatten_raw_grads(graw, batch))
        assert float(state["f1"]["opt"]["g2sum"][6, 0]) > 0.1
        assert float(state["f1"]["show"][6, 0]) > 0

        out = eng.evict(state, min_show=100.0, rng=jax.random.PRNGKey(9))
        g2 = np.asarray(out["f1"]["opt"]["g2sum"])
        np.testing.assert_allclose(g2, 0.1)              # reset to initial
        np.testing.assert_array_equal(np.asarray(out["f1"]["show"]), 0.0)
        w = np.asarray(out["f1"]["w"])
        assert np.all(np.abs(w) <= 0.1)                  # initial_scale range
        assert np.abs(w).mean() > 0.01                   # actually random
        # distribution check: evicted rows look like a fresh init
        fresh = np.asarray(opt.table_init(jax.random.PRNGKey(11), w.shape))
        assert abs(np.abs(w).mean() - np.abs(fresh).mean()) < 0.01

    def test_maybe_evict_uses_feature_drop_show(self):
        eng = make_engine(opt=SparseAdaGrad(feature_drop_show=1.0))
        state = eng.init(jax.random.PRNGKey(0))
        state["f1"]["show"] = state["f1"]["show"].at[5].set(10.0)
        out = eng.maybe_evict(state, rng=jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(out["f1"]["w"][5]),
                                      np.asarray(state["f1"]["w"][5]))
        assert np.any(np.asarray(out["f1"]["w"][6])
                      != np.asarray(state["f1"]["w"][6]))
        # no threshold -> no-op
        eng2 = make_engine(opt=SparseAdaGrad())
        st2 = eng2.init(jax.random.PRNGKey(0))
        out2 = eng2.maybe_evict(st2)
        np.testing.assert_array_equal(np.asarray(out2["f1"]["w"]),
                                      np.asarray(st2["f1"]["w"]))


class TestShardedLookup:
    def test_matches_local_forward_and_grad(self, mesh8):
        from jax.sharding import NamedSharding
        n = 8
        rows_total, dim, e = 64, 8, 16
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (rows_total, dim))
        flat_rows = jax.random.randint(jax.random.PRNGKey(1), (n * e,), 0, rows_total)

        local = jnp.take(w, flat_rows, axis=0)

        shard_fn = jax.shard_map(
            lambda wl, r: all_to_all_lookup(wl, r, "data"),
            mesh=mesh8, in_specs=(P("data", None), P("data")),
            out_specs=P("data"), check_vma=False)
        sharded = shard_fn(w, flat_rows)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                                   rtol=1e-6)

        # gradient parity
        tgt = jax.random.normal(jax.random.PRNGKey(2), (n * e, dim))
        g_local = jax.grad(lambda w_: jnp.sum((jnp.take(w_, flat_rows, 0) - tgt) ** 2))(w)
        g_shard = jax.grad(lambda w_: jnp.sum((shard_fn(w_, flat_rows) - tgt) ** 2))(w)
        np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_local),
                                   rtol=1e-5, atol=1e-5)

    def test_bounded_capacity_uniform_ids_exact(self, mesh8):
        """capacity_factor=2 with uniform ids never overflows: identical to
        the exact exchange (the production-pod configuration — per-device
        exchange work O(E) instead of O(n·E))."""
        from recommendsystem_tpu.embedding.engine import all_to_all_lookup
        n, dim = 8, 4
        rows_total = 64 * n
        w = jax.random.normal(jax.random.PRNGKey(0), (rows_total, dim))
        e = 64 * n   # per-device E = 64; capacity = ceil(2*64/8) = 16, mean 8
        flat_rows = jax.random.randint(jax.random.PRNGKey(1), (e,), 0,
                                       rows_total)
        local = jnp.take(w, flat_rows, axis=0)
        fn = jax.shard_map(
            lambda wl, r: all_to_all_lookup(wl, r, "data", capacity_factor=2.0),
            mesh=mesh8, in_specs=(P("data", None), P("data")),
            out_specs=P("data"), check_vma=False)
        np.testing.assert_allclose(np.asarray(fn(w, flat_rows)),
                                   np.asarray(local), rtol=1e-6)

    def test_bounded_capacity_skewed_ids_drop_to_zero(self, mesh8):
        """Pathological skew (every id owned by shard 0) with a bounded
        capacity: in-capacity entries are exact, overflowed entries come back
        as zeros — dropped and detectable, never mis-routed into another
        row."""
        from recommendsystem_tpu.embedding.engine import all_to_all_lookup
        n, dim = 8, 4
        rows_total = 64 * n
        w = jax.random.normal(jax.random.PRNGKey(0), (rows_total, dim))
        e = 16 * n   # per-device E = 16, capacity = ceil(2*16/8) = 4
        flat_rows = jax.random.randint(jax.random.PRNGKey(1), (e,), 0, 8)
        local = np.asarray(jnp.take(w, flat_rows, axis=0))
        fn = jax.shard_map(
            lambda wl, r: all_to_all_lookup(wl, r, "data", capacity_factor=2.0),
            mesh=mesh8, in_specs=(P("data", None), P("data")),
            out_specs=P("data"), check_vma=False)
        out = np.asarray(fn(w, flat_rows))
        # each device's first 4 entries (per owner-0 bucket) are exact
        per_dev = 16
        for d in range(n):
            seg = slice(d * per_dev, d * per_dev + 4)
            np.testing.assert_allclose(out[seg], local[seg], rtol=1e-6)
        dropped = np.all(out == 0, axis=1)
        kept = ~dropped
        np.testing.assert_allclose(out[kept], local[kept], rtol=1e-6)
        assert dropped.sum() == (per_dev - 4) * n   # overflow beyond capacity

    def test_bounded_capacity_padding_consumes_no_capacity(self, mesh8):
        """The production regime: most stream entries are padding (mask 0,
        id 0 from the zero-fill parse contract).  Without mask-aware routing
        the padding would all rank into shard 0's bucket and overflow it,
        dropping REAL shard-0 entries; with the mask passed, every real
        entry survives a 2x bounded capacity and masked entries come back
        as zeros (they are mask-zeroed downstream anyway)."""
        from recommendsystem_tpu.embedding.engine import all_to_all_lookup
        n, dim = 8, 4
        rows_total = 64 * n
        w = jax.random.normal(jax.random.PRNGKey(0), (rows_total, dim))
        e = 64 * n
        rng = np.random.default_rng(3)
        # ~75% padding: real ids uniform, padding id 0 (all owned by shard 0)
        mask = (rng.random(e) < 0.25).astype(np.float32)
        flat = (rng.integers(0, rows_total, e) * mask).astype(np.int32)
        local = np.asarray(jnp.take(w, flat, axis=0))
        fn = jax.shard_map(
            lambda wl, r, m: all_to_all_lookup(wl, r, "data",
                                               capacity_factor=2.0, mask=m),
            mesh=mesh8, in_specs=(P("data", None), P("data"), P("data")),
            out_specs=P("data"), check_vma=False)
        out = np.asarray(fn(w, jnp.asarray(flat), jnp.asarray(mask)))
        real = mask > 0
        np.testing.assert_allclose(out[real], local[real], rtol=1e-6)
        assert (out[~real] == 0).all()

    def test_exchange_capacity_auto(self):
        from recommendsystem_tpu.embedding.engine import exchange_capacity
        n = 8
        # large exchange: bounded 2x
        assert exchange_capacity(256 * n, n, "auto") == \
            exchange_capacity(256 * n, n, 2.0)
        # small exchange: exact
        assert exchange_capacity(100, n, "auto") == 100
        assert exchange_capacity(100, n, None) == 100

    def test_a2a_drop_report(self, mesh8):
        """Uniform hashed ids at the bounded default: zero drops; a
        pathologically skewed batch under a tight explicit bound: counted."""
        eng = make_engine(bucket=64 * 8 * 8, num_shards=8)
        b, l = 64 * 8, 8   # E = 4096 = 512/device -> auto resolves bounded
        rng = np.random.default_rng(0)
        rows = rng.integers(0, 64 * 8 * 8, (b, l)).astype(np.int32)
        mask = np.ones((b, l), np.float32)
        batch = {"f1": IdBatch(jnp.asarray(rows), jnp.asarray(mask))}
        report = eng.a2a_drop_report(batch, mesh8)
        assert sum(jax.tree.leaves(report)) == 0, report
        # every id owned by shard 0, tight capacity -> real drops counted
        eng.a2a_capacity_factor = 1.0
        skew = {"f1": IdBatch(jnp.asarray(rows % 8), jnp.asarray(mask))}
        report = eng.a2a_drop_report(skew, mesh8)
        assert sum(jax.tree.leaves(report)) > 0, report

    def test_engine_sharded_mode(self, mesh8):
        eng = make_engine(bucket=64, num_shards=8)
        state = eng.init(jax.random.PRNGKey(0))
        b, l = 8, 4
        rows = jax.random.randint(jax.random.PRNGKey(1), (b, l), 0, 64)
        mask = jnp.ones((b, l), jnp.float32)
        batch = {"f1": IdBatch(rows, mask)}

        local_out = eng.lookup(eng.weights(state), batch)["f1"]

        def inner(w, r, m):
            out = eng.lookup({"f1": w}, {"f1": IdBatch(r, m)}, mode="sharded")
            return out["f1"]

        fn = jax.shard_map(inner, mesh=mesh8,
                           in_specs=(P("data", None), P("data"), P("data")),
                           out_specs=P("data"), check_vma=False)
        sharded_out = fn(state["f1"]["w"], rows, mask)
        np.testing.assert_allclose(np.asarray(sharded_out), np.asarray(local_out),
                                   rtol=1e-5, atol=1e-6)


class TestScatterUpdatePath:
    """The scatter (two-stage) train path must match the dense-lazy path."""

    def _setup(self, opt):
        eng = make_engine(bucket=64, seq=True, opt=opt)
        state = eng.init(jax.random.PRNGKey(0))
        rows = jnp.array([[1, 2, 2, 0], [5, 5, 0, 0]], jnp.int32)
        mask = jnp.array([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.float32)
        srows = jnp.array([[7, 8, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0]], jnp.int32)
        smask = jnp.array([[1, 1, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0]], jnp.float32)
        batch = {"f1": IdBatch(rows, mask), "seq_f1": IdBatch(srows, smask)}
        return eng, state, batch

    @pytest.mark.parametrize("opt", [SparseAdam(learning_rate=0.01),
                                     SparseAdaGrad(learning_rate=0.01)])
    def test_matches_dense_path(self, opt):
        eng, state, batch = self._setup(opt)

        def loss_from_embs(out):
            emb = out["f1"]
            seq, m = out["seq_f1"]
            return jnp.sum(emb ** 2) + jnp.sum(jnp.sin(seq))

        # dense path
        def loss_dense(weights):
            return loss_from_embs(eng.lookup(weights, batch))
        gw = jax.grad(loss_dense)(eng.weights(state))
        dense_state = eng.apply_gradients(state, gw, eng.row_counts(batch))

        # scatter path
        raw = eng.gather_raw(eng.weights(state), batch)
        graw = jax.grad(lambda r: loss_from_embs(eng.combine_raw(r, batch)))(raw)
        flat = eng.flatten_raw_grads(graw, batch)
        scatter_state = eng.apply_gradients_scatter(state, flat)

        np.testing.assert_allclose(np.asarray(scatter_state["f1"]["w"]),
                                   np.asarray(dense_state["f1"]["w"]),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(scatter_state["f1"]["show"]),
                                   np.asarray(dense_state["f1"]["show"]))
        for k in dense_state["f1"]["opt"]:
            np.testing.assert_allclose(
                np.asarray(scatter_state["f1"]["opt"][k]),
                np.asarray(dense_state["f1"]["opt"][k]),
                rtol=1e-5, atol=1e-7, err_msg=k)

    def test_train_step_modes_agree(self):
        from recommendsystem_tpu.data import synthetic_batch
        from recommendsystem_tpu.models import create_model
        from recommendsystem_tpu.train import create_train_state
        from recommendsystem_tpu.train.step import make_train_step

        bundle = create_model("autoint", bucket_size=256)
        batch, dense, labels, w = synthetic_batch(bundle, 16, seed=0)
        state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
        rng = jax.random.PRNGKey(3)
        s1, i1 = make_train_step(bundle, donate=False,
                                 sparse_update="dense")(state, batch, labels, w, None, rng)
        s2, i2 = make_train_step(bundle, donate=False,
                                 sparse_update="scatter")(state, batch, labels, w, None, rng)
        np.testing.assert_allclose(float(i2["loss"]), float(i1["loss"]), rtol=1e-6)
        for tkey in s1.tables:
            np.testing.assert_allclose(np.asarray(s2.tables[tkey]["w"]),
                                       np.asarray(s1.tables[tkey]["w"]),
                                       rtol=1e-5, atol=1e-7)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-7)


class TestTableGrouping:
    def _engines(self):
        cols = []
        for s in ("a", "b", "c"):
            cat = category_column(s, 64)
            cols.append(embedding_column(cat, 8, combiner="mean"))
        cols.append(embedding_column(category_column("d", 32), 4, combiner="mean"))
        # classic state layout: this class tests grouped-vs-flat table
        # equivalence with direct row surgery on (rows, D) arrays; the
        # packed-state layout has its own parity suite (test_packed_state,
        # test_packed)
        flat = EmbeddingFeatures(list(cols), SparseAdam(learning_rate=0.01),
                                 packed_state=False)
        grouped = EmbeddingFeatures(list(cols), SparseAdam(learning_rate=0.01),
                                    group_tables=True, packed_state=False)
        return flat, grouped

    def _batch(self):
        rng = np.random.default_rng(0)
        batch = {}
        for s in ("a", "b", "c"):
            batch[s] = IdBatch(jnp.asarray(rng.integers(0, 64, (4, 3)), jnp.int32),
                               jnp.ones((4, 3), jnp.float32))
        batch["d"] = IdBatch(jnp.asarray(rng.integers(0, 32, (4, 3)), jnp.int32),
                             jnp.ones((4, 3), jnp.float32))
        return batch

    def test_storage_layout(self):
        # packed alignment pads each member's stride to lcm(gather_pack=16,
        # scatter_pack=14) = 112 so lane-group positions stay table-local
        _, grouped = self._engines()
        assert set(grouped.storage) == {"group_112x8", "d"}
        assert grouped.storage["group_112x8"] == (112 * 3, 8)

    def test_lookup_matches_flat(self):
        flat, grouped = self._engines()
        batch = self._batch()
        sf = flat.init(jax.random.PRNGKey(0))
        sg = grouped.init(jax.random.PRNGKey(1))
        # copy flat tables into the grouped storage to compare numerics
        for tkey in ("a", "b", "c"):
            skey, off, rows = grouped.table_map[tkey]
            sg[skey]["w"] = sg[skey]["w"].at[off:off + rows].set(sf[tkey]["w"])
        sg["d"]["w"] = sf["d"]["w"]
        of = flat.lookup(flat.weights(sf), batch)
        og = grouped.lookup(grouped.weights(sg), batch)
        for k in of:
            np.testing.assert_allclose(np.asarray(og[k]), np.asarray(of[k]),
                                       rtol=1e-6)
        # gather_raw path too (fused single take per group)
        rf = flat.gather_raw(flat.weights(sf), batch)
        rg = grouped.gather_raw(grouped.weights(sg), batch)
        for k in rf:
            np.testing.assert_allclose(np.asarray(rg[k]), np.asarray(rf[k]),
                                       rtol=1e-6)

    def test_scatter_training_step_matches_flat(self):
        flat, grouped = self._engines()
        batch = self._batch()
        sf = flat.init(jax.random.PRNGKey(0))
        sg = grouped.init(jax.random.PRNGKey(1))
        for tkey in ("a", "b", "c"):
            skey, off, rows = grouped.table_map[tkey]
            sg[skey]["w"] = sg[skey]["w"].at[off:off + rows].set(sf[tkey]["w"])
        sg["d"]["w"] = sf["d"]["w"]

        def run(eng, state):
            raw = eng.gather_raw(eng.weights(state), batch)
            def loss(r):
                out = eng.combine_raw(r, batch)
                return sum(jnp.sum(v ** 2) for v in out.values())
            graw = jax.grad(loss)(raw)
            return eng.apply_gradients_scatter(
                state, eng.flatten_raw_grads(graw, batch))

        nf = run(flat, sf)
        ng = run(grouped, sg)
        for tkey in ("a", "b", "c"):
            skey, off, rows = grouped.table_map[tkey]
            np.testing.assert_allclose(
                np.asarray(ng[skey]["w"][off:off + rows]),
                np.asarray(nf[tkey]["w"]), rtol=1e-5, atol=1e-7, err_msg=tkey)
            np.testing.assert_allclose(
                np.asarray(ng[skey]["show"][off:off + rows]),
                np.asarray(nf[tkey]["show"]), err_msg=tkey)


class TestBf16Tables:
    def test_lookup_and_training_in_bf16_storage(self):
        cat = category_column("f1", 64)
        cols = [embedding_column(cat, 8, combiner="mean")]
        # classic layout: this unit test inspects classic state fields
        # (packed-state bf16 has its own suites)
        eng = EmbeddingFeatures(cols, SparseAdam(learning_rate=0.05),
                                table_dtype=jnp.bfloat16, packed_state=False)
        state = eng.init(jax.random.PRNGKey(0))
        assert state["f1"]["w"].dtype == jnp.bfloat16
        assert state["f1"]["opt"]["m"].dtype == jnp.float32  # fp32 opt state

        rows = jnp.array([[3, 9, 0, 0]], jnp.int32)
        mask = jnp.array([[1, 1, 0, 0]], jnp.float32)
        batch = {"f1": IdBatch(rows, mask)}
        out = eng.lookup(eng.weights(state), batch)["f1"]
        assert out.dtype == jnp.float32  # compute dtype

        # scatter training step moves only touched rows, in storage dtype
        raw = eng.gather_raw(eng.weights(state), batch)
        assert raw["f1"].dtype == jnp.float32
        graw = jax.grad(lambda r: jnp.sum(eng.combine_raw(r, batch)["f1"] ** 2))(raw)
        new = eng.apply_gradients_scatter(state, eng.flatten_raw_grads(graw, batch))
        assert new["f1"]["w"].dtype == jnp.bfloat16
        w0 = np.asarray(state["f1"]["w"].astype(jnp.float32))
        w1 = np.asarray(new["f1"]["w"].astype(jnp.float32))
        changed = np.abs(w1 - w0).sum(1) > 0
        assert changed[3] and changed[9] and changed.sum() == 2

    def test_auto_table_dtype_mixed_dims(self):
        """table_dtype='auto': bf16 for dim>=32 rows, fp32 for narrow rows —
        both inside ONE engine, trained in one scatter step."""
        cols = [embedding_column(category_column("wide", 64), 32, combiner="mean"),
                embedding_column(category_column("narrow", 64), 8, combiner="mean")]
        eng = EmbeddingFeatures(cols, SparseAdam(learning_rate=0.05),
                                table_dtype="auto", group_tables=True)
        state = eng.init(jax.random.PRNGKey(0))
        skey_w = eng.table_map["wide"][0]
        skey_n = eng.table_map["narrow"][0]
        assert state[skey_w]["w"].dtype == jnp.bfloat16
        assert state[skey_n]["w"].dtype == jnp.float32

        batch = {"wide": IdBatch(jnp.array([[3, 5]], jnp.int32),
                                 jnp.ones((1, 2), jnp.float32)),
                 "narrow": IdBatch(jnp.array([[7, 0]], jnp.int32),
                                   jnp.array([[1.0, 0.0]], jnp.float32))}

        def loss(raw):
            out = eng.combine_raw(raw, batch)
            return sum(jnp.sum(v ** 2) for v in out.values())

        raw = eng.gather_raw(eng.weights(state), batch)
        graw = jax.grad(loss)(raw)
        new = jax.jit(eng.apply_gradients_scatter)(
            state, eng.flatten_raw_grads(graw, batch))
        assert new[skey_w]["w"].dtype == jnp.bfloat16
        assert new[skey_n]["w"].dtype == jnp.float32
        w_new, w_old = eng.weights(new), eng.weights(state)
        for skey, touched in ((skey_w, [3, 5]), (skey_n, [7])):
            d = np.abs(np.asarray(w_new[skey].astype(jnp.float32))
                       - np.asarray(w_old[skey].astype(jnp.float32))).sum(1)
            assert (d[touched] > 0).all() and (d > 0).sum() == len(touched)

    def test_dense_path_bf16(self):
        cat = category_column("f1", 32)
        eng = EmbeddingFeatures([embedding_column(cat, 8, combiner="mean")],
                                SparseAdaGrad(learning_rate=0.05),
                                table_dtype=jnp.bfloat16)
        state = eng.init(jax.random.PRNGKey(0))
        batch = {"f1": IdBatch(jnp.array([[1, 2]], jnp.int32),
                               jnp.ones((1, 2), jnp.float32))}
        g = jax.grad(lambda w: jnp.sum(eng.lookup(w, batch)["f1"] ** 2))(
            jax.tree.map(lambda x: x, eng.weights(state)))
        new = eng.apply_gradients(state, g, eng.row_counts(batch))
        assert new["f1"]["w"].dtype == jnp.bfloat16


class TestValidation:
    def test_sequence_column_requires_max_len(self):
        cat = category_column("x", 16)
        with pytest.raises(ValueError):
            embedding_column(cat, 8, combiner=None)

    def test_unknown_combiner(self):
        cat = category_column("x", 16)
        with pytest.raises(ValueError):
            embedding_column(cat, 8, combiner="max")

    def test_duplicate_column_key(self):
        cat = category_column("x", 16)
        with pytest.raises(ValueError):
            EmbeddingFeatures([embedding_column(cat, 8),
                               embedding_column(cat, 8)], SparseAdam())

    def test_inconsistent_dims_same_table(self):
        cat = category_column("x", 16)
        with pytest.raises(ValueError):
            EmbeddingFeatures([embedding_column(cat, 8, name="a"),
                               embedding_column(cat, 16, name="b")],
                              SparseAdam())

    def test_sequence_slot_redefinition_raises(self):
        from recommendsystem_tpu.core.config import load_model_parameter_json
        raw = {"feature_slot": {
            "sparse_feature": {"f": {"emb_size": 8, "slot_id": ["1"]}},
            "sequence_feature": {"s": {"emb_size": 8, "slot_id": ["1"]}},
            "dense_feature": {}}}
        with pytest.raises(ValueError):
            load_model_parameter_json(raw)
