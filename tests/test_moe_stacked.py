"""Stacked/vmapped MMoE: math parity with per-expert MMOE and expert-axis
sharding over the model mesh axis (expert parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendsystem_tpu import nn as rnn
from recommendsystem_tpu.core import create_mesh


def test_matches_unstacked_mmoe():
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 12))
    ref = rnn.MMOE(num_tasks=2, num_experts=3, expert_dnn_units=(8,))
    vref = ref.init(jax.random.PRNGKey(1), x)
    stacked = rnn.MMOEStacked(num_tasks=2, num_experts=3, expert_dnn_units=(8,))
    vst = stacked.init(jax.random.PRNGKey(1), x)

    # graft the per-expert weights into the stacked layout
    p = jax.tree.map(lambda a: np.array(a), vst["params"])
    for e in range(3):
        src = vref["params"][f"expert{e}"]
        p["experts"]["kernel0"][e] = np.asarray(src["kernel0"])
        p["experts"]["bias0"][e] = np.asarray(src["bias0"])
    for t in range(2):
        p[f"task{t}_gate"] = jax.tree.map(np.asarray,
                                          vref["params"][f"task{t}_gate"])
    out_ref = ref.apply(vref, x)
    out_st = stacked.apply({"params": p}, x)
    for a, b in zip(out_ref, out_st):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5)


def test_expert_parallel_sharding(cpu_devices):
    mesh = create_mesh(cpu_devices[:8], model_parallel=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    m = rnn.MMOEStacked(num_tasks=2, num_experts=4, expert_dnn_units=(8,))
    v = m.init(jax.random.PRNGKey(1), x)
    out_repl = m.apply(v, x)

    sh = rnn.expert_shardings(v["params"], mesh)
    # stacked expert kernels sharded over 'model'
    spec = sh["experts"]["kernel0"].spec
    assert spec[0] == "model"
    v_sharded = {"params": jax.device_put(v["params"], sh)}
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    out_ep = jax.jit(lambda vv, xx: m.apply(vv, xx))(v_sharded, x_sh)
    for a, b in zip(out_repl, out_ep):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_ple_stacked_matches_unstacked():
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 10))
    ref = rnn.PLE(num_tasks=2, num_shared_experts=2, num_specific_experts=2,
                  expert_dnn_units=(8,))
    vref = ref.init(jax.random.PRNGKey(1), x)
    st = rnn.PLEStacked(num_tasks=2, num_shared_experts=2,
                        num_specific_experts=2, expert_dnn_units=(8,))
    vst = st.init(jax.random.PRNGKey(1), x)
    p = jax.tree.map(lambda a: np.array(a), vst["params"])
    for e in range(2):
        src = vref["params"][f"shared_expert{e}"]
        p["experts"]["kernel0"][e] = np.asarray(src["kernel0"])
        p["experts"]["bias0"][e] = np.asarray(src["bias0"])
    for t in range(2):
        for j in range(2):
            src = vref["params"][f"task{t}_expert{j}"]
            p["specific_experts"]["kernel0"][t * 2 + j] = np.asarray(src["kernel0"])
            p["specific_experts"]["bias0"][t * 2 + j] = np.asarray(src["bias0"])
        p[f"task{t}_gate"] = jax.tree.map(np.asarray,
                                          vref["params"][f"task{t}_gate"])
    out_ref = ref.apply(vref, x)
    out_st = st.apply({"params": p}, x)
    for a, b in zip(out_ref, out_st):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-7)


def test_ple_stacked_expert_sharding(cpu_devices):
    mesh = create_mesh(cpu_devices[:8], model_parallel=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 12))
    m = rnn.PLEStacked(num_tasks=2, num_shared_experts=2,
                       num_specific_experts=2, expert_dnn_units=(8,))
    v = m.init(jax.random.PRNGKey(1), x)
    out_repl = m.apply(v, x)
    sh = rnn.expert_shardings(v["params"], mesh)
    assert sh["specific_experts"]["kernel0"].spec[0] == "model"
    v_sh = {"params": jax.device_put(v["params"], sh)}
    out_ep = jax.jit(lambda vv, xx: m.apply(vv, xx))(v_sh, x)
    for a, b in zip(out_repl, out_ep):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_rough_rank_stacked_experts_trains():
    """Zoo-level expert parallelism: create_model('rough_rank',
    stacked_experts=True) stacks the PLE expert params on a leading axis and
    trains end to end."""
    from recommendsystem_tpu.models import create_model
    from recommendsystem_tpu.data import synthetic_batch
    from recommendsystem_tpu.train import fit

    bundle = create_model("rough_rank", bucket_size=256, stacked_experts=True)
    batch, dense, labels, w = synthetic_batch(bundle, 16)
    variables, _ = bundle.init(jax.random.PRNGKey(0), batch)
    user_ple = variables["params"]["sub_model_user"]["ple"]
    assert user_ple["experts"]["kernel0"].shape[0] == 4        # shared stack
    assert user_ple["specific_experts"]["kernel0"].shape[0] == 8  # 2 tasks x 4

    losses = []
    fit(bundle, (synthetic_batch(bundle, 32, seed=i) for i in range(15)),
        callbacks=[lambda i, s, info: losses.append(float(info["loss"]))],
        log_every=0)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_multi_head_stacked_matches_unstacked():
    """multi_head stacked_experts: same math as the 8 per-expert Denses
    (incl. the 8-built/7-used quirk) once weights are grafted across."""
    from recommendsystem_tpu.models import create_model
    from recommendsystem_tpu.data import synthetic_batch

    ref = create_model("multi_head", bucket_size=128)
    st = create_model("multi_head", bucket_size=128, stacked_experts=True)
    batch, _, _, _ = synthetic_batch(ref, 8)
    vref, tables = ref.init(jax.random.PRNGKey(0), batch)
    vst, _ = st.init(jax.random.PRNGKey(0), batch)

    p = jax.tree.map(np.array, vst["params"])
    for name in vref["params"]:
        if name.startswith("expert_"):
            e = int(name.split("_")[1])
            p["experts_fc1"]["kernel"][e] = np.asarray(vref["params"][name]["kernel"])
            p["experts_fc1"]["bias"][e] = np.asarray(vref["params"][name]["bias"])
        else:
            p[name] = jax.tree.map(np.asarray, vref["params"][name])

    embs = ref.embedding.lookup(ref.embedding.weights(tables), batch)
    out_ref = ref.module.apply({"params": vref["params"]}, embs, training=False)
    out_st = st.module.apply({"params": p}, embs, training=False)
    assert set(out_ref) == set(out_st)
    for t in out_ref:
        np.testing.assert_allclose(np.asarray(out_st[t]), np.asarray(out_ref[t]),
                                   rtol=2e-5, atol=1e-6)


def test_ctr_stacked_matches_unstacked():
    """ctr stacked_experts: exact match with the per-expert graph (incl. the
    per-layer 2*sigmoid gates over gate features) after weight grafting."""
    from recommendsystem_tpu.models import create_model
    from recommendsystem_tpu.data import synthetic_batch

    ref = create_model("ctr", bucket_size=128)
    st = create_model("ctr", bucket_size=128, stacked_experts=True)
    batch, _, _, _ = synthetic_batch(ref, 8)
    vref, tables = ref.init(jax.random.PRNGKey(0), batch)
    vst, _ = st.init(jax.random.PRNGKey(0), batch)

    p = jax.tree.map(np.array, vst["params"])
    for name, sub in vref["params"].items():
        if name.startswith("expert_output_") or (
                name.startswith("gate_") and name.count("_") == 3):
            # expert_output_{i}_{j} / gate_{i}_{j}_{1,2} -> experts/<layer>[i]
            parts = name.split("_")
            if name.startswith("expert_output_"):
                i, j = int(parts[2]), int(parts[3])
                tgt = f"expert_output_{j}"
            else:
                i, j, k = int(parts[1]), int(parts[2]), int(parts[3])
                tgt = f"gate_{j}_{k}"
            for leaf in sub:
                p["experts"][tgt][leaf][i] = np.asarray(sub[leaf])
        else:
            p[name] = jax.tree.map(np.asarray, vref["params"][name])

    embs = ref.embedding.lookup(ref.embedding.weights(tables), batch)
    out_ref = ref.module.apply({"params": vref["params"]}, embs, training=False)
    out_st = st.module.apply({"params": p}, embs, training=False)
    for t in out_ref:
        np.testing.assert_allclose(np.asarray(out_st[t]), np.asarray(out_ref[t]),
                                   rtol=2e-5, atol=1e-6)


def test_staytime_stacked_matches_unstacked():
    """staytime stacked_experts: exact match with the per-expert PPNet-gated
    towers after weight grafting."""
    from recommendsystem_tpu.models import create_model
    from recommendsystem_tpu.models.staytime import StaytimeConfig
    from recommendsystem_tpu.data import synthetic_batch

    cfg = StaytimeConfig(bucket_size=128, seq_max_len=4)
    ref = create_model("staytime", cfg=cfg)
    st = create_model("staytime", cfg=cfg, stacked_experts=True)
    batch, _, _, _ = synthetic_batch(ref, 8)
    vref, tables = ref.init(jax.random.PRNGKey(0), batch)
    vst, _ = st.init(jax.random.PRNGKey(0), batch)

    p = jax.tree.map(np.array, vst["params"])
    for name, sub in vref["params"].items():
        parts = name.split("_")
        if name.startswith("expert_output_"):
            i, j = int(parts[2]), int(parts[3])
            tgt = f"expert_output_{j}"
        elif name.startswith("gate_") and name.count("_") == 3:
            i, j, k = int(parts[1]), int(parts[2]), int(parts[3])
            tgt = f"gate_{j}_{k}"
        else:
            p[name] = jax.tree.map(np.asarray, sub)
            continue
        for leaf in sub:
            p["experts"][tgt][leaf][i] = np.asarray(sub[leaf])

    embs = ref.embedding.lookup(ref.embedding.weights(tables), batch)
    out_ref = ref.module.apply({"params": vref["params"]}, embs, training=False)
    out_st = st.module.apply({"params": p}, embs, training=False)
    for t in out_ref:
        np.testing.assert_allclose(np.asarray(out_st[t]), np.asarray(out_ref[t]),
                                   rtol=2e-5, atol=1e-5)
