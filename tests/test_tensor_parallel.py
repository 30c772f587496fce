"""2-D mesh (data, model): tensor-parallel dense kernels via sharding
annotations must reproduce the replicated result exactly (XLA inserts the
collectives) — the scale-out axis beyond the reference's DP+PS design."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendsystem_tpu.core import create_mesh
from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state, state_shardings
from recommendsystem_tpu.train.step import make_train_step


def test_2d_mesh_tp_matches_replicated(cpu_devices):
    mesh = create_mesh(cpu_devices[:8], model_parallel=2)   # data=4, model=2
    n_data = 4
    bundle = create_model("ctr", bucket_size=64 * n_data, num_shards=n_data)
    batch, dense, labels, weight = synthetic_batch(bundle, 4 * n_data, seed=0)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch)

    rng = jax.random.PRNGKey(7)
    step = make_train_step(bundle, donate=False)
    ref_state, ref_info = step(state, batch, labels, weight, None, rng)

    sh = state_shardings(bundle, state, mesh, tensor_parallel=True)
    # some large kernels must actually be model-sharded
    tp_specs = [s.spec for s in jax.tree.leaves(sh.params)
                if s.spec == P(None, "model")]
    assert len(tp_specs) >= 4, "no kernels picked up tensor-parallel sharding"

    data_sh = NamedSharding(mesh, P("data"))
    state_p = jax.device_put(state, sh)
    batch_p = jax.device_put(batch, jax.tree.map(lambda _: data_sh, batch))
    labels_p = jax.device_put(labels, jax.tree.map(lambda _: data_sh, labels))
    weight_p = jax.device_put(weight, data_sh)

    tp_state, tp_info = step(state_p, batch_p, labels_p, weight_p, None, rng)
    np.testing.assert_allclose(float(tp_info["loss"]), float(ref_info["loss"]),
                               rtol=1e-5)
    key = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ref_state.params), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(tp_state.params), key=key)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5, err_msg=str(ka))
    # TP shardings survive the step
    tp_after = [x.sharding.spec for x in jax.tree.leaves(tp_state.params)
                if x.ndim == 2 and x.shape[-1] >= 64 and x.shape[-1] % 2 == 0]
    assert any(spec == P(None, "model") for spec in tp_after)
