"""Donation copies in the ctr212 step: ~22 ms/step of same-layout copies
of the (98304, 128) state arrays showed up in the round-5 trace
(~130 copies x 0.17 ms).  Is donation failing (copies vanish with
donate=False because nothing aliases), or are they inherent?

A/B: donate=True vs donate=False, same process, fetch-verified.  If the
two match, the copies are inherent scheduling copies; if donate=False is
SLOWER by ~state-size/bandwidth, donation works and the copies are
something else.
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models.ctr import production_ctr
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

bundle = production_ctr("/root/reference/rank/ctr/model_parameter.json",
                        bucket_size=16384)   # half-size: two states must fit
b, dense, labels, weight = synthetic_batch(bundle, 8192, seed=0,
                                           ids_per_feature={})
b = jax.device_put(b); labels = jax.device_put(labels)
weight = jax.device_put(weight)

for donate in (True, False):
    state = create_train_state(bundle, jax.random.PRNGKey(0), b, dense)
    step = make_train_step(bundle, donate=donate)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for _ in range(2):
        out = step(state, b, labels, weight, dense, rng)
        if donate:
            state, info = out
        else:
            _, info = out
    fetch(info)
    print(f"donate={donate}: compile+warmup {time.perf_counter()-t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        out = step(state, b, labels, weight, dense, rng)
        if donate:
            state, info = out
        else:
            _, info = out
    loss = fetch(info)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"donate={donate}: {ms:.1f} ms/step (loss {loss:.4f})", flush=True)
    del state, out
