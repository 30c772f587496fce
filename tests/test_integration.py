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
