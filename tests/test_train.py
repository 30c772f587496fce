"""End-to-end training tests: losses decrease, metrics stream, AUC learns the
planted signal, checkpoints round-trip (SURVEY §4 plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import (
    create_train_state, evaluate, fit, dump_predict,
    make_eval_step, make_train_step, restore_checkpoint, save_checkpoint,
)
from recommendsystem_tpu.train import losses as L
from recommendsystem_tpu.train import metrics as M


def dataset(bundle, n_batches, batch_size=64, seed0=0):
    for i in range(n_batches):
        yield synthetic_batch(bundle, batch_size, seed=seed0 + i)


class TestLosses:
    def test_ce_sum_mean_matches_numpy(self):
        y = jnp.array([[1.0], [0.0]])
        p = jnp.array([[0.9], [0.2]])
        got = L.cross_entropy_sum_mean(y, p)
        expect = np.mean([-np.log(0.9 + 1e-6),
                          -np.log(1 - 0.2 + 1e-6)])
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_kl_ignores_last_column(self):
        dist = np.full((2, 400), 1.0 / 400, np.float32)
        y = np.concatenate([dist, np.array([[42.0], [7.0]])], axis=1)
        p = np.concatenate([dist, np.array([[1.0], [2.0]])], axis=1)
        got = L.kl_loss(jnp.asarray(y), jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)

    def test_log_mse(self):
        y = jnp.array([[1000.0]])           # 1s -> log(2)
        p = jnp.array([[np.log(2.0)]])
        np.testing.assert_allclose(L.log_mse_loss(y, p), 0.0, atol=1e-6)


class TestMetrics:
    def test_auc_perfect_and_random(self):
        m = M.auc()
        s = m.init()
        y = jnp.array([0.0, 0, 1, 1])
        s = m.update(s, y, jnp.array([0.1, 0.2, 0.8, 0.9]))
        assert float(m.compute(s)) > 0.99
        s2 = m.init()
        s2 = m.update(s2, y, jnp.array([0.5, 0.5, 0.5, 0.5]))
        assert abs(float(m.compute(s2)) - 0.5) < 0.02

    def test_auc_vs_sklearn(self):
        from sklearn.metrics import roc_auc_score
        rng = np.random.default_rng(0)
        y = rng.integers(0, 2, 500).astype(np.float32)
        p = np.clip(y * 0.3 + rng.uniform(0, 0.7, 500), 0, 1).astype(np.float32)
        m = M.auc()
        s = m.update(m.init(), jnp.asarray(y), jnp.asarray(p))
        got = float(m.compute(s))
        expect = roc_auc_score(y, p)
        assert abs(got - expect) < 0.01

    def test_copc_and_ctr(self):
        y = jnp.array([[1.0], [0.0], [1.0], [0.0]])
        p = jnp.array([[0.5], [0.5], [0.5], [0.5]])
        mc = M.copc()
        s = mc.update(mc.init(), y, p)
        np.testing.assert_allclose(float(mc.compute(s)), 2.0 / 2.0)
        mr = M.ctr()
        s = mr.update(mr.init(), y, p)
        np.testing.assert_allclose(float(mr.compute(s)), 0.5)


class TestTrainLoop:
    def test_autoint_learns_planted_signal(self):
        # production LRs are 5e-5 (base_model.py:163,192); raise them so the
        # signal is learnable within a 60-step test
        bundle = create_model("autoint", bucket_size=512,
                              sparse_lr=5e-2, dense_lr=1e-2)
        state = fit(bundle, dataset(bundle, 120), log_every=0)
        metrics = evaluate(bundle, dataset(bundle, 8, seed0=1000), state)
        auc = float(metrics["video_id_rank_skip_model"]["auc"])
        assert auc > 0.6, f"AUC {auc} did not beat random on planted signal"

    def test_loss_decreases_finish(self):
        bundle = create_model("finish", bucket_size=512)
        losses = []
        fit(bundle, dataset(bundle, 30),
            callbacks=[lambda i, s, info: losses.append(float(info["loss"]))],
            log_every=0)
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_multi_task_loss_weights_staytime(self):
        from recommendsystem_tpu.models.staytime import StaytimeConfig
        cfg = StaytimeConfig(bucket_size=256, seq_max_len=4)
        bundle = create_model("staytime", cfg=cfg)
        losses = []
        fit(bundle, dataset(bundle, 8, batch_size=32),
            callbacks=[lambda i, s, info: losses.append(
                {k: float(v) for k, v in info.items() if k.startswith("loss")})],
            log_every=0)
        assert losses[-1]["loss"] < losses[0]["loss"]
        # all three task losses present
        assert sum(1 for k in losses[0] if k.startswith("loss/")) == 3

    def test_rough_rank_distill_trains(self):
        bundle = create_model("rough_rank", bucket_size=256)
        losses = []
        fit(bundle, dataset(bundle, 20, batch_size=32),
            callbacks=[lambda i, s, info: losses.append(float(info["loss"]))],
            log_every=0)
        assert losses[-1] < losses[0]


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        bundle = create_model("autoint", bucket_size=256)
        batch, dense, labels, w = synthetic_batch(bundle, 16)
        state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
        step = make_train_step(bundle, donate=False)
        state, _ = step(state, batch, labels, w, None, jax.random.PRNGKey(1))
        path = save_checkpoint(str(tmp_path / "ckpt"), state)
        restored = restore_checkpoint(str(tmp_path / "ckpt"), state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_roundtrip_bf16_state(self, tmp_path):
        """bf16 tables + bf16 Adam m/v survive the orbax roundtrip with
        dtypes and bits intact."""
        bundle = create_model("autoint", bucket_size=256,
                              table_dtype=jnp.bfloat16,
                              opt_state_dtype=jnp.bfloat16)
        batch, dense, labels, w = synthetic_batch(bundle, 16)
        state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
        step = make_train_step(bundle, donate=False)
        state, _ = step(state, batch, labels, w, None, jax.random.PRNGKey(1))
        save_checkpoint(str(tmp_path / "ckpt"), state)
        restored = restore_checkpoint(str(tmp_path / "ckpt"), state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(
                np.atleast_1d(np.asarray(a)).view(np.uint8),
                np.atleast_1d(np.asarray(b)).view(np.uint8))

    def test_dump_predict(self, tmp_path):
        bundle = create_model("autoint", bucket_size=256)
        batch, dense, labels, w = synthetic_batch(bundle, 8)
        state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
        out = str(tmp_path / "preds.tsv")
        n = dump_predict(bundle, [(batch, None, labels, w)], state, out)
        lines = open(out).read().strip().split("\n")
        assert n == 8 and len(lines) == 8
        assert all(len(l.split("\t")) == 2 for l in lines)


class TestResumeAndProfile:
    def test_fit_resume_from_checkpoint(self, tmp_path):
        bundle = create_model("autoint", bucket_size=256)
        ckdir = str(tmp_path / "ck")
        state1 = fit(bundle, dataset(bundle, 4, batch_size=16), log_every=0,
                     checkpoint_dir=ckdir, checkpoint_every=2)
        # resume picks up the saved step counter
        state2 = fit(bundle, dataset(bundle, 2, batch_size=16), log_every=0,
                     checkpoint_dir=ckdir, resume=True)
        assert int(state2.step) == 4 + 2  # 4 saved at step 4, +2 new steps

    def test_fit_profile_trace(self, tmp_path):
        bundle = create_model("autoint", bucket_size=256)
        pdir = str(tmp_path / "prof")
        fit(bundle, dataset(bundle, 4, batch_size=16), log_every=0,
            profile_dir=pdir, profile_steps=(1, 3))
        import os
        found = any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
                    for _, _, fs in os.walk(pdir) for f in fs)
        assert found, "no profiler trace written"


class TestServingExport:
    def test_export_roundtrip(self, tmp_path):
        from recommendsystem_tpu.train.export import (
            export_serving, load_serving, make_serving_fn)

        bundle = create_model("autoint", bucket_size=256)
        batch, dense, labels, w = synthetic_batch(bundle, 8)
        state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
        weights = bundle.embedding.weights(state.tables)

        blob = export_serving(bundle, state, batch, path=str(tmp_path / "srv"))
        assert (tmp_path / "srv" / "model.stablehlo").exists()
        assert (tmp_path / "srv" / "signature.json").exists()

        served = load_serving(blob)
        got = served(weights, state.params, batch, None)
        want = make_serving_fn(bundle)(weights, state.params, batch, None)
        for t in want:
            np.testing.assert_allclose(np.asarray(got[t]), np.asarray(want[t]),
                                       rtol=1e-5)


class TestNanGuard:
    def test_raise_on_nonfinite_loss(self):
        bundle = create_model("autoint", bucket_size=256)
        batch, dense, labels, w = synthetic_batch(bundle, 16)
        labels = {k: v * np.nan for k, v in labels.items()}
        with pytest.raises(FloatingPointError):
            fit(bundle, [(batch, None, labels, w)] * 2, log_every=1,
                nan_guard="raise")


def test_dump_predict_need_y(tmp_path):
    bundle = create_model("autoint", bucket_size=256)
    batch, dense, labels, w = synthetic_batch(bundle, 4)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    out = str(tmp_path / "preds_y.tsv")
    n = dump_predict(bundle, [(batch, None, labels, w)], state, out, need_y=True)
    lines = [l.split("\t") for l in open(out).read().strip().split("\n")]
    assert n == 4 and all(len(l) == 3 for l in lines)   # id, score, label
    for i, l in enumerate(lines):
        assert float(l[2]) == float(labels["video_id_rank_skip_model"][i, 0])


def test_evaluate_gauc():
    from recommendsystem_tpu.train.gauc_eval import evaluate_gauc
    bundle = create_model("autoint", bucket_size=512,
                          sparse_lr=5e-2, dense_lr=1e-2)
    state = fit(bundle, dataset(bundle, 40), log_every=0)

    def ds_with_users():
        rng = np.random.default_rng(0)
        for i in range(6):
            b, d, l, w = synthetic_batch(bundle, 64, seed=500 + i)
            users = rng.integers(0, 8, 64)    # 8 users -> multi-impression groups
            yield b, d, l, w, {"user_id": users}

    gaucs = evaluate_gauc(bundle, ds_with_users(), state)
    g = gaucs["video_id_rank_skip_model"]
    assert 0.45 < g <= 1.0
    # trained model should group-rank better than random on planted signal
    assert g > 0.55, f"GAUC {g}"


def test_bf16_compute_policy():
    """compute_dtype=bf16: master params stay fp32, outputs come back fp32,
    forward tracks the fp32 model to bf16 tolerance, and learning survives."""
    from recommendsystem_tpu.train.step import apply_model

    b32 = create_model("autoint", bucket_size=512,
                       sparse_lr=5e-2, dense_lr=1e-2)
    b16 = create_model("autoint", bucket_size=512, compute_dtype=jnp.bfloat16,
                       sparse_lr=5e-2, dense_lr=1e-2)
    batch, dense, labels, w = synthetic_batch(b32, 64)
    state = create_train_state(b32, jax.random.PRNGKey(0), batch)
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.params))

    embs = b32.embedding.lookup(b32.embedding.weights(state.tables), batch)
    out32 = apply_model(b32, state.params, embs)
    out16 = apply_model(b16, state.params, embs)
    t = "video_id_rank_skip_model"
    assert out16[t].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16[t]), np.asarray(out32[t]),
                               atol=3e-2)

    state = fit(b16, dataset(b16, 40), log_every=0)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.params))
    m = evaluate(b16, dataset(b16, 6, seed0=2000), state)
    assert float(m[t]["auc"]) > 0.6


def test_bf16_opt_state_preserves_learning():
    """opt_state_dtype=bf16 stores Adam m/v in bf16 (arithmetic fp32);
    learning on the planted signal must survive."""
    bundle = create_model("autoint", bucket_size=512,
                          opt_state_dtype=jnp.bfloat16,
                          sparse_lr=5e-2, dense_lr=1e-2)
    batch, _, _, _ = synthetic_batch(bundle, 8)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    skey = next(iter(state.tables))
    assert state.tables[skey]["opt"]["m"].dtype == jnp.bfloat16
    assert state.tables[skey]["opt"]["t"].dtype == jnp.float32
    state = fit(bundle, dataset(bundle, 120), log_every=0)
    metrics = evaluate(bundle, dataset(bundle, 8, seed0=1000), state)
    auc = float(metrics["video_id_rank_skip_model"]["auc"])
    assert auc > 0.6, f"AUC {auc} with bf16 opt state"


def test_bf16_tables_preserve_learning():
    """bf16 table storage (opt-in) must not materially change learnability."""
    aucs = {}
    for dtype_name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        kwargs = {"table_dtype": dtype} if dtype is not None else {}
        bundle = create_model("finish", bucket_size=512,
                              sparse_lr=5e-2, dense_lr=1e-2, **kwargs)
        state = fit(bundle, dataset(bundle, 40), log_every=0)
        m = evaluate(bundle, dataset(bundle, 6, seed0=2000), state)
        aucs[dtype_name] = float(
            m["video_id_rank_finish_nb_lr_rongh_bundle"]["auc"])
    assert aucs["bf16"] > 0.6
    assert abs(aucs["bf16"] - aucs["fp32"]) < 0.05, aucs


@pytest.mark.parametrize("model", ["staytime", "rough_rank", "multi_head"])
def test_export_all_models(model, tmp_path):
    from recommendsystem_tpu.train.export import export_serving, load_serving, make_serving_fn
    if model == "staytime":
        from recommendsystem_tpu.models.staytime import StaytimeConfig
        bundle = create_model(model, cfg=StaytimeConfig(bucket_size=128, seq_max_len=4))
    else:
        bundle = create_model(model, bucket_size=128)
    batch, dense, labels, w = synthetic_batch(bundle, 4)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch, dense)
    weights = bundle.embedding.weights(state.tables)
    blob = export_serving(bundle, state, batch, dense_inputs=dense)
    served = load_serving(blob)
    got = served(weights, state.params, batch, dense)
    want = make_serving_fn(bundle)(weights, state.params, batch, dense)
    for t in want:
        np.testing.assert_allclose(np.asarray(got[t]), np.asarray(want[t]),
                                   rtol=1e-5, err_msg=f"{model}/{t}")


def test_scan_train_step_matches_sequential():
    """lax.scan multi-step driver == K sequential single steps (same rngs,
    same batches) on state, tables, and per-step losses."""
    import jax.numpy as jnp
    from recommendsystem_tpu.train.step import make_scan_train_step

    bundle = create_model("autoint", bucket_size=256)
    K = 4
    seqs = [synthetic_batch(bundle, 16, seed=i) for i in range(K)]
    state = create_train_state(bundle, jax.random.PRNGKey(0), seqs[0][0])
    rngs = jax.random.split(jax.random.PRNGKey(7), K)

    step = make_train_step(bundle, donate=False)
    st_seq = state
    seq_losses = []
    for i in range(K):
        b, d, l, w = seqs[i]
        st_seq, info = step(st_seq, b, l, w, None, rngs[i])
        seq_losses.append(float(info["loss"]))

    stack = lambda leaves: jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)
    sb = stack([s[0] for s in seqs])
    sl = stack([{k: jnp.asarray(v) for k, v in s[2].items()} for s in seqs])
    sw = jnp.stack([jnp.asarray(s[3]) for s in seqs])
    scan_step = make_scan_train_step(bundle, donate=False)
    st_scan, infos = scan_step(state, sb, sl, sw, None, rngs)

    np.testing.assert_allclose(np.asarray(infos["loss"]), seq_losses, rtol=1e-6)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(st_seq.params),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(st_scan.params),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6,
                                   atol=1e-7, err_msg=str(ka))
    for tkey in st_seq.tables:
        np.testing.assert_allclose(np.asarray(st_scan.tables[tkey]["w"]),
                                   np.asarray(st_seq.tables[tkey]["w"]),
                                   rtol=1e-6, atol=1e-7)


def test_fit_scan_steps_matches_single_step_fit():
    """fit(scan_steps=K) over a finite dataset == plain fit, step for step
    (same rng schedule is not guaranteed, so compare on learning outcome and
    step count; exact scan-vs-sequential parity is covered separately)."""
    from recommendsystem_tpu.train import fit

    def data(n, batch=32):
        bundle0 = create_model("autoint", bucket_size=128)
        for i in range(n):
            b, d, l, w = synthetic_batch(bundle0, batch, seed=i)
            yield b, d, l, w

    bundle = create_model("autoint", bucket_size=128)
    state = fit(bundle, data(10), steps=10, log_every=0)
    assert int(state.step) == 10

    bundle2 = create_model("autoint", bucket_size=128)
    state2 = fit(bundle2, data(10), steps=10, log_every=0, scan_steps=4)
    assert int(state2.step) == 10       # 4 + 4 + 2 (tail falls back)
