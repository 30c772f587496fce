"""Integration tests: reference-scale configs, per-model checkpoint/predict
round-trips, and the shipped example config."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendsystem_tpu.core.config import (load_model_parameter_json,
                                             synthetic_ctr_config)
from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import MODEL_REGISTRY, create_model
from recommendsystem_tpu.train import (create_train_state, restore_checkpoint,
                                       save_checkpoint)
from recommendsystem_tpu.train.step import make_predict_step, make_train_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_scale_ctr_config():
    """212 features with shared slots + all four bias types — the shape of
    rank/ctr/model_parameter.json — must build and run a step."""
    cfg = synthetic_ctr_config(num_slots=180, num_bias=32, seed=3)
    n_features = len(cfg.sparse_features)
    assert n_features == 212
    bundle = create_model("ctr", cfg=cfg, bucket_size=1024)
    batch, dense, labels, weight = synthetic_batch(bundle, 8, seed=0,
                                                   ids_per_feature=3)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    step = make_train_step(bundle, donate=False)
    state, info = step(state, batch, labels, weight, None, jax.random.PRNGKey(1))
    assert np.isfinite(float(info["loss"]))
    # every interval slice accounted for: sum of interval widths + bias
    # widths == wide row consumption per slot
    for slot, si in cfg.slot_intervals.items():
        total = sum(e - s for s, e in si.intervals)
        total += sum(e - s for s, e in cfg.bias_intervals.get(slot, {}).values())
        assert total == si.total_emb_size


REFERENCE_CTR_JSON = "/root/reference/rank/ctr/model_parameter.json"


@pytest.mark.skipif(not os.path.exists(REFERENCE_CTR_JSON),
                    reason="reference config not present")
def test_real_production_ctr_config_trains():
    """The REAL production config (212 features / 176 shared slots / rows to
    96 wide) builds the flagship ranker and trains a step end-to-end, with
    the production gate-slot list (base_model.py:135)."""
    from recommendsystem_tpu.models.ctr import production_ctr

    cfg = load_model_parameter_json(REFERENCE_CTR_JSON)
    assert len(cfg.sparse_features) == 212
    assert len(cfg.slot_intervals) == 176
    assert cfg.max_embed_size == 96

    bundle = production_ctr(REFERENCE_CTR_JSON, bucket_size=2048)
    assert len(bundle.embedding.columns) == 176
    batch, dense, labels, weight = synthetic_batch(bundle, 8, seed=0,
                                                   ids_per_feature=2)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    step = make_train_step(bundle, donate=False)
    state, info = step(state, batch, labels, weight, None, jax.random.PRNGKey(1))
    assert np.isfinite(float(info["loss"]))
    for t in bundle.losses:
        assert f"loss/{t}" in info


def test_feature_id_remap_shares_tables():
    """Config-driven featureid_to_slot (base_model.py:89-107): two feature
    slots remapped to one table share the embedding space — ids drawn by
    EITHER column hit the SAME rows, and one table backs both columns."""
    raw = {"feature_slot": {"sparse_feature": {
        "feat_a": {"emb_size": 8, "slot_id": ["41119"]},
        "feat_b": {"emb_size": 8, "slot_id": ["42285"]},
        "feat_c": {"emb_size": 8, "slot_id": ["1000"]},
    }, "sequence_feature": {}, "dense_feature": {}},
        "featureid_to_slot": {"41119": "8351", "42285": "8351"}}
    cfg = load_model_parameter_json(raw)
    assert cfg.table_slot("41119") == "8351" == cfg.table_slot("42285")
    assert cfg.table_slot("1000") == "1000"

    bundle = create_model("autoint", cfg=cfg, bucket_size=64)
    eng = bundle.embedding
    tkeys = {k: c.categorical_column.key for k, c in eng.columns.items()}
    assert tkeys["41119"] == "8351" == tkeys["42285"]   # one shared table
    assert tkeys["1000"] == "1000"
    # distinct tables, even if group_tables stacks them into one storage
    off = {k: eng.table_map[t] for k, t in tkeys.items()}
    assert off["41119"] == off["42285"]
    assert off["1000"] != off["41119"]

    # the shared table sees updates from BOTH columns' ids
    import jax.numpy as jnp
    from recommendsystem_tpu.embedding.engine import IdBatch
    batch = {
        "41119": IdBatch(jnp.full((4, 1), 3, jnp.int32), jnp.ones((4, 1))),
        "42285": IdBatch(jnp.full((4, 1), 7, jnp.int32), jnp.ones((4, 1))),
        "1000": IdBatch(jnp.full((4, 1), 5, jnp.int32), jnp.ones((4, 1))),
    }
    labels = {t: np.ones((4, 1), np.float32) for t in bundle.losses}
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
    # (rows, D) view regardless of the storage layout (packed-state tables)
    before = {k: np.asarray(v) for k, v in eng.weights(state.tables).items()}
    step = make_train_step(bundle, donate=False)
    state, info = step(state, batch, labels, np.ones((4, 1), np.float32),
                       None, jax.random.PRNGKey(1))
    after = {k: np.asarray(v) for k, v in eng.weights(state.tables).items()}
    skey, off_a, _ = eng.table_map[eng.columns["41119"].categorical_column.key]
    w_delta = np.abs(after[skey] - before[skey]).sum(1)
    changed = set(np.nonzero(w_delta > 0)[0].tolist())
    assert {3 + off_a, 7 + off_a} <= changed       # both columns' ids moved


def test_example_config_loads_and_runs():
    path = os.path.join(REPO, "examples", "ctr_model_parameter.json")
    cfg = load_model_parameter_json(path)
    assert cfg.model_param["interact"]["head_num"] == 2
    bundle = create_model("ctr", cfg=cfg, bucket_size=512)
    batch, dense, labels, weight = synthetic_batch(bundle, 8, seed=0)
    variables, tables = bundle.init(jax.random.PRNGKey(0), batch)
    out = bundle.forward(variables, bundle.embedding.weights(tables), batch)
    for t in bundle.losses:
        assert out[t].shape == (8, 1)


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_checkpoint_predict_roundtrip(name, tmp_path):
    """Every model: train a step, checkpoint, restore, predictions match."""
    kwargs = {}
    if name == "staytime":
        from recommendsystem_tpu.models.staytime import StaytimeConfig
        kwargs["cfg"] = StaytimeConfig(bucket_size=128, seq_max_len=4)
    else:
        kwargs["bucket_size"] = 256
    bundle = create_model(name, **kwargs)
    batch, dense, labels, weight = synthetic_batch(bundle, 8, seed=0)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch, dense)
    step = make_train_step(bundle, donate=False)
    state, _ = step(state, batch, labels, weight, dense, jax.random.PRNGKey(1))

    predict = make_predict_step(bundle)
    before = jax.device_get(predict(state, batch, dense))

    save_checkpoint(str(tmp_path / "ck"), state)
    restored = restore_checkpoint(str(tmp_path / "ck"), state)
    after = jax.device_get(predict(restored, batch, dense))
    for k in before:
        np.testing.assert_allclose(after[k], before[k], err_msg=f"{name}/{k}")
