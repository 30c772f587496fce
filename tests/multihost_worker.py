"""Worker process for the multi-host integration test.

Each process owns 2 virtual CPU devices; jax.distributed stitches them into
one 4-device global mesh.  Tables are row-sharded across ALL devices
(crossing the process boundary = the DCN case), batches are data-parallel
with per-process local shards, and a few sharded train steps must agree
byte-for-byte across processes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

num_processes = int(sys.argv[1])
process_id = int(sys.argv[2])
port = sys.argv[3]

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=num_processes,
                           process_id=process_id)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendsystem_tpu.core import create_mesh  # noqa: E402
from recommendsystem_tpu.core.mesh import process_count, process_index  # noqa: E402
from recommendsystem_tpu.data import synthetic_batch  # noqa: E402
from recommendsystem_tpu.models import create_model  # noqa: E402
from recommendsystem_tpu.train import create_train_state, state_shardings  # noqa: E402
from recommendsystem_tpu.train.step import make_train_step  # noqa: E402

assert process_count() == num_processes
assert process_index() == process_id

n_global = len(jax.devices())
assert n_global == 2 * num_processes, jax.devices()

mesh = create_mesh(jax.devices())
bundle = create_model("autoint", bucket_size=64 * n_global, num_shards=n_global)

GLOBAL_BATCH = 8 * n_global
data_shard = NamedSharding(mesh, P("data"))


def global_put(tree, seed):
    """Build global arrays from per-process local shards — the multi-host
    input path (each host feeds only its own rows)."""
    full_batch, _, labels, weight = synthetic_batch(bundle, GLOBAL_BATCH,
                                                    seed=seed)
    per = GLOBAL_BATCH // num_processes
    lo, hi = process_id * per, (process_id + 1) * per

    def put(x):
        return jax.make_array_from_process_local_data(data_shard, x[lo:hi])

    return (jax.tree.map(put, full_batch), jax.tree.map(put, labels),
            put(weight))


state = create_train_state(
    bundle, jax.random.PRNGKey(0),
    synthetic_batch(bundle, GLOBAL_BATCH, seed=0)[0])
state = jax.device_put(state, state_shardings(bundle, state, mesh))

step = make_train_step(bundle, mesh=mesh, mode="sharded", donate=False)

losses = []
for i in range(3):
    batch, labels, weight = global_put(None, seed=i)
    state, info = step(state, batch, labels, weight, None, jax.random.PRNGKey(i))
    losses.append(float(info["loss"]))

tkey = next(iter(state.tables))
assert state.tables[tkey]["w"].sharding.spec[0] == "data"
print(f"WORKER {process_id} losses {' '.join('%.6f' % l for l in losses)}",
      flush=True)
