"""Storage-group size vs gather prefetch: the round-5 headline trace shows
XLA copying 5 of 6 table storages into S(1) scratch (custom-call operands)
and gathering from there at ~1.8 ns/id, while the sixth reads HBM directly
at ~11.9 ns/id (15.6 ms vs 2.35).  If the prefetch budget is size-bound,
smaller `max_group_bytes` chunks may get ALL storages prefetched.

Sweeps max_group_bytes over the headline autoint config, full train step,
donated threaded state, fetch-verified.
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import recommendsystem_tpu.embedding.engine as eng_mod
from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

_orig_init = eng_mod.EmbeddingFeatures.__init__

def bench(mgb_mb):
    def patched(self, *a, **kw):
        kw["max_group_bytes"] = mgb_mb << 20
        _orig_init(self, *a, **kw)
    eng_mod.EmbeddingFeatures.__init__ = patched
    try:
        bundle = create_model("autoint", bucket_size=265000)
    finally:
        eng_mod.EmbeddingFeatures.__init__ = _orig_init
    n_st = len(bundle.embedding.storage)
    b, dense, labels, weight = synthetic_batch(bundle, 65536, seed=0,
                                               ids_per_feature=5)
    b = jax.device_put(b); labels = jax.device_put(labels)
    weight = jax.device_put(weight)
    state = create_train_state(bundle, jax.random.PRNGKey(0), b)
    step = make_train_step(bundle, donate=True)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for _ in range(2):
        state, info = step(state, b, labels, weight, None, rng)
    fetch(info)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        state, info = step(state, b, labels, weight, None, rng)
    loss = fetch(info)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"max_group_bytes={mgb_mb:3d}MB ({n_st:2d} storages): "
          f"{ms:7.1f} ms/step ({65536/ms*1e3:,.0f} ex/s, loss {loss:.4f}, "
          f"compile {compile_s:.0f}s)", flush=True)
    del state

for mgb in (40, 20, 10, 80, 160):
    bench(mgb)
