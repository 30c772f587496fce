"""Streaming (in-jit) per-user GAUC vs the offline engine.

The offline engine (``search/gauc.py``) is the reference implementation of
``gaussian_model_utils.py:242-280``; the streaming metric must agree with it
exactly in the collision-free / distinct-bin regime and approximately end to
end through the jitted eval step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.search.gauc import group_auc
from recommendsystem_tpu.train import fit
from recommendsystem_tpu.train.gauc_eval import (
    evaluate_gauc, evaluate_gauc_streaming)
from recommendsystem_tpu.train.streaming_gauc import StreamingGauc
from recommendsystem_tpu.data import synthetic_batch


def _case(n=200, n_users=8, num_bins=256, seed=0):
    """Globally-unique prediction bins -> no ties, streaming == offline."""
    rng = np.random.default_rng(seed)
    bins = rng.permutation(num_bins)[:n] if n <= num_bins else \
        rng.integers(0, num_bins, n)
    preds = (bins + 0.5) / num_bins
    labels = rng.integers(0, 2, n).astype(np.float32)
    users = rng.integers(0, n_users, n)
    return labels, preds.astype(np.float32), users


class TestStreamingGauc:
    def test_matches_offline_group_auc_exact(self):
        labels, preds, users = _case()
        m = StreamingGauc(num_buckets=16, num_bins=256, hash_ids=False)
        s = m.update(m.init(), jnp.asarray(labels), jnp.asarray(preds),
                     jnp.asarray(users))
        got = float(m.compute(s))
        total, nimp = group_auc(labels, preds, users)
        # offline rounds each per-user AUC to 5 decimals
        assert abs(got - total / nimp) < 1e-4, (got, total / nimp)

    def test_additive_state(self):
        labels, preds, users = _case(seed=1)
        m = StreamingGauc(num_buckets=16, num_bins=64, hash_ids=False)
        full = m.update(m.init(), jnp.asarray(labels), jnp.asarray(preds),
                        jnp.asarray(users))
        h = len(labels) // 2
        s1 = m.update(m.init(), jnp.asarray(labels[:h]), jnp.asarray(preds[:h]),
                      jnp.asarray(users[:h]))
        s2 = m.update(m.init(), jnp.asarray(labels[h:]), jnp.asarray(preds[h:]),
                      jnp.asarray(users[h:]))
        summed = jax.tree.map(lambda a, b: a + b, s1, s2)
        for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(summed)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(float(m.compute(full)),
                                   float(m.compute(summed)), rtol=1e-6)

    def test_single_class_buckets_skipped(self):
        m = StreamingGauc(num_buckets=4, num_bins=8, hash_ids=False)
        # user 0 all-positive (skipped), user 1 perfectly ranked
        y = jnp.array([1.0, 1.0, 1.0, 0.0, 1.0])
        p = jnp.array([0.1, 0.2, 0.3, 0.1, 0.9])
        u = jnp.array([0, 0, 0, 1, 1])
        s = m.update(m.init(), y, p, u)
        np.testing.assert_allclose(float(m.compute(s)), 1.0)

    def test_under_jit_with_weights(self):
        labels, preds, users = _case(seed=2)
        m = StreamingGauc(num_buckets=16, num_bins=64, hash_ids=False)
        upd = jax.jit(m.update)
        # integer weights == sample repetition
        w = np.where(users == 0, 3.0, 1.0).astype(np.float32)
        s = upd(m.init(), jnp.asarray(labels), jnp.asarray(preds),
                jnp.asarray(users), jnp.asarray(w))
        rep = np.repeat(np.arange(len(labels)), w.astype(int))
        s2 = m.update(m.init(), jnp.asarray(labels[rep]),
                      jnp.asarray(preds[rep]), jnp.asarray(users[rep]))
        np.testing.assert_allclose(float(m.compute(s)), float(m.compute(s2)),
                                   rtol=1e-5)

    def test_hashing_spreads_users(self):
        m = StreamingGauc(num_buckets=64, hash_ids=True)
        b = np.asarray(m.bucket(jnp.arange(1024)))
        assert (np.bincount(b, minlength=64) > 0).mean() > 0.9


def test_sharded_update_psum_equals_local():
    """Data-sharded update over an 8-device mesh + psum == full-batch local
    update — the in-jit eval-on-mesh contract."""
    from jax.sharding import Mesh, PartitionSpec as P

    labels, preds, users = _case(n=256, seed=3)
    m = StreamingGauc(num_buckets=16, num_bins=64, hash_ids=False)
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices), ("data",))

    def upd(y, p, u):
        local = m.update(m.init(), y, p, u)
        return jax.tree.map(lambda x: jax.lax.psum(x, "data"), local)

    fn = jax.jit(jax.shard_map(upd, mesh=mesh,
                               in_specs=(P("data"), P("data"), P("data")),
                               out_specs=P()))
    sharded = fn(jnp.asarray(labels), jnp.asarray(preds), jnp.asarray(users))
    local = m.update(m.init(), jnp.asarray(labels), jnp.asarray(preds),
                     jnp.asarray(users))
    for a, b in zip(jax.tree.leaves(sharded), jax.tree.leaves(local)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(m.compute(sharded)),
                               float(m.compute(local)), rtol=1e-6)


def test_streaming_end_to_end_matches_offline():
    bundle = create_model("autoint", bucket_size=512,
                          sparse_lr=5e-2, dense_lr=1e-2)

    def ds(n):
        for i in range(n):
            yield synthetic_batch(bundle, 64, seed=i)

    state = fit(bundle, ds(40), log_every=0)

    def ds_with_users():
        rng = np.random.default_rng(0)
        for i in range(6):
            b, d, l, w = synthetic_batch(bundle, 64, seed=500 + i)
            yield b, d, l, w, {"user_id": rng.integers(0, 8, 64)}

    offline = evaluate_gauc(bundle, ds_with_users(), state)
    streaming = evaluate_gauc_streaming(bundle, ds_with_users(), state,
                                        gauc=StreamingGauc(num_bins=512))
    t = "video_id_rank_skip_model"
    assert abs(streaming[t] - offline[t]) < 0.02, (streaming[t], offline[t])
    assert streaming[t] > 0.55


class TestStreamingSpearman:
    def _case(self, n=120, n_users=6, bins=128, seed=0):
        rng = np.random.default_rng(seed)
        pb = rng.permutation(bins)[:n]
        lb = rng.integers(0, bins, n)
        preds = (pb + 0.5) / bins          # globally distinct pred bins
        labels = (lb + 0.5) / bins
        users = rng.integers(0, n_users, n)
        return labels.astype(np.float32), preds.astype(np.float32), users

    def test_matches_offline_spearman_group_auc(self):
        from recommendsystem_tpu.train.streaming_gauc import StreamingSpearmanGauc
        labels, preds, users = self._case()
        m = StreamingSpearmanGauc(num_buckets=8, pred_bins=128, label_bins=128,
                                  hash_ids=False)
        s = m.update(m.init(), jnp.asarray(labels), jnp.asarray(preds),
                     jnp.asarray(users))
        got = float(m.compute(s))
        total, nimp = group_auc(labels, preds, users, is_spearman=True)
        assert abs(got - total / nimp) < 1e-5, (got, total / nimp)

    def test_tied_pred_half_credit(self):
        from recommendsystem_tpu.train.streaming_gauc import StreamingSpearmanGauc
        m = StreamingSpearmanGauc(num_buckets=4, pred_bins=8, label_bins=8,
                                  hash_ids=False)
        s = m.update(m.init(), jnp.array([0.1, 0.9]), jnp.array([0.5, 0.5]),
                     jnp.array([0, 0]))
        np.testing.assert_allclose(float(m.compute(s)), 0.5)

    def test_additive_and_jit(self):
        from recommendsystem_tpu.train.streaming_gauc import StreamingSpearmanGauc
        labels, preds, users = self._case(seed=3)
        m = StreamingSpearmanGauc(num_buckets=8, pred_bins=64, label_bins=64,
                                  hash_ids=False)
        upd = jax.jit(m.update)
        h = len(labels) // 2
        s1 = upd(m.init(), jnp.asarray(labels[:h]), jnp.asarray(preds[:h]),
                 jnp.asarray(users[:h]))
        s2 = upd(m.init(), jnp.asarray(labels[h:]), jnp.asarray(preds[h:]),
                 jnp.asarray(users[h:]))
        full = upd(m.init(), jnp.asarray(labels), jnp.asarray(preds),
                   jnp.asarray(users))
        summed = jax.tree.map(lambda a, b: a + b, s1, s2)
        np.testing.assert_allclose(float(m.compute(summed)),
                                   float(m.compute(full)), rtol=1e-6)


def test_out_of_range_predictions_are_counted():
    """Out-of-range predictions clip into edge bins (documented) and the
    state's 'oor' counter exposes the misconfiguration."""
    import jax.numpy as jnp
    from recommendsystem_tpu.train.streaming_gauc import StreamingGauc

    g = StreamingGauc(num_buckets=8, num_bins=16)
    s = g.init()
    y = jnp.array([1.0, 0.0, 1.0, 0.0])
    p = jnp.array([0.5, 0.2, 3.7, -1.0])      # two out of [0, 1)
    u = jnp.array([1, 2, 3, 4])
    s = g.update(s, y, p, u)
    assert float(s["oor"]) == 2.0
    s = g.update(s, y, jnp.array([0.1, 0.2, 0.3, 0.4]), u)
    assert float(s["oor"]) == 2.0             # in-range adds nothing


def test_gauc_dict_missing_task_raises():
    from recommendsystem_tpu.train.gauc_eval import _per_task
    from recommendsystem_tpu.train.streaming_gauc import StreamingGauc

    with pytest.raises(KeyError, match="no metric for task"):
        _per_task({"click": StreamingGauc()}, ("click", "finish"))
    out = _per_task({"click": StreamingGauc()}, ("click",))
    assert set(out) == {"click"}
