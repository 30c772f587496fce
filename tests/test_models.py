"""Model zoo smoke + semantics tests: every factory builds, inits, runs a
jitted forward, and produces outputs with the contracted names/shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import MODEL_REGISTRY, create_model
from recommendsystem_tpu.models import staytime as st

SMALL = dict(bucket_size=512)
B = 16


def build(name, **kw):
    if name == "staytime":
        cfg = st.StaytimeConfig(bucket_size=512, seq_max_len=8)
        return create_model(name, cfg=cfg, **kw)
    return create_model(name, **SMALL, **kw)


def run_forward(bundle, training=False):
    batch, dense, labels, weight = synthetic_batch(bundle, B, seed=0)
    variables, tables = bundle.init(jax.random.PRNGKey(0), batch, dense_inputs=dense)
    rngs = {"dropout": jax.random.PRNGKey(1)} if training else None
    out = bundle.forward(variables, bundle.embedding.weights(tables), batch,
                         training=training, rngs=rngs, dense_inputs=dense)
    return bundle, out, labels


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shapes(name):
    bundle, out, labels = run_forward(build(name))
    for task in bundle.losses:
        assert task in out, f"{name} missing output {task}"
        assert out[task].shape[0] == B
        assert np.isfinite(np.asarray(out[task])).all()


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_losses_evaluate(name):
    bundle, out, labels = run_forward(build(name))
    for task, loss_fn in bundle.losses.items():
        val = loss_fn(jnp.asarray(labels[task]), out[task])
        assert np.isfinite(np.asarray(val)).all()


def test_autoint_output_clipped():
    bundle, out, _ = run_forward(build("autoint"))
    o = np.asarray(out["video_id_rank_skip_model"])
    assert (o >= 1e-6).all() and (o <= 1.0).all()


def test_ctr_two_tasks_clipped():
    bundle, out, _ = run_forward(build("ctr"))
    for t in ("video_id_rank_hp_ctr_addfeasetwo_click",
              "video_id_rank_hp_ctr_addfeasetwo_effect_click"):
        o = np.asarray(out[t])
        assert o.shape == (B, 1) and (o >= 1e-6).all() and (o <= 1.0).all()


def test_multi_head_seven_tasks():
    from recommendsystem_tpu.models.multi_head import TASKS
    bundle, out, _ = run_forward(build("multi_head"))
    assert len(TASKS) == 7
    for t in TASKS:
        o = np.asarray(out[t])
        assert o.shape == (B, 1) and (o > 0).all() and (o < 1).all()


def test_staytime_heads():
    bundle, out, _ = run_forward(build("staytime"))
    dist_ev = np.asarray(out[st.T_STAY])
    assert dist_ev.shape == (B, 401)
    # first 400 columns are a softmax distribution
    np.testing.assert_allclose(dist_ev[:, :400].sum(-1), 1.0, rtol=1e-4)
    ev = np.asarray(out[f"{st.T_STAY}_pred"])
    assert ev.shape == (B, 1) and (ev >= 0).all()
    # EV consistency: dist @ bins (where positive)
    expect = dist_ev[:, :400] @ np.asarray(st.BIN_LIST)
    np.testing.assert_allclose(ev[:, 0], np.maximum(expect, 0.0), atol=1e-4)
    # predict view maps staytime -> EV head
    pv = bundle.predict_view(out)
    assert pv[st.T_STAY].shape == (B, 1)


def test_rough_rank_outputs_and_flag_switch():
    bundle = build("rough_rank")
    batch, dense, labels, _ = synthetic_batch(bundle, B, seed=0)
    variables, tables = bundle.init(jax.random.PRNGKey(0), batch, dense_inputs=dense)
    w = bundle.embedding.weights(tables)
    out0 = bundle.forward(variables, w, batch,
                          dense_inputs={"4575": np.zeros((B, 1), np.float32)})
    out1 = bundle.forward(variables, w, batch,
                          dense_inputs={"4575": np.ones((B, 1), np.float32)})
    # the dense flag must switch the user-tower branch -> different embeddings
    assert np.abs(np.asarray(out0["user_emb"]) - np.asarray(out1["user_emb"])).max() > 1e-6
    # item tower independent of the flag
    np.testing.assert_allclose(np.asarray(out0["item_emb"]),
                               np.asarray(out1["item_emb"]), atol=1e-7)
    # distillation: per-sample MSE between logits, >= 0
    assert (np.asarray(out0["distill"]) >= 0).all()


def test_training_mode_stochastic_where_dropout_present():
    bundle = build("autoint")
    batch, dense, labels, _ = synthetic_batch(bundle, B, seed=0)
    variables, tables = bundle.init(jax.random.PRNGKey(0), batch)
    w = bundle.embedding.weights(tables)
    o1 = bundle.forward(variables, w, batch, training=True,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = bundle.forward(variables, w, batch, training=True,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(o1["video_id_rank_skip_model"]) -
                  np.asarray(o2["video_id_rank_skip_model"])).max() > 0
