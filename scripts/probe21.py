"""O(touched-rows) optimizer vs lazy O(table) pass: on-chip A/B.

Configs:
  - production-scale: autoint with 24 x 4M-row x 8 tables (96M rows,
    ~9.2 GB w+m+v in the packed-state layout) at batch 32768 — the
    SWEEP_r04_predict config that ran 500.2 ms/step with the lazy pass.
  - headline-scale: 24 x 265k (6.4M rows) at batch 65536 — where the lazy
    pass was measured to win in round 1.

Same-process A/B (threshold toggled), donated threaded state, every
window fetch-verified (CLAUDE.md rules).
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def bench(bucket, batch_size, steps=10):
    print(f"\n== bucket {bucket:,} x 24 tables, batch {batch_size}", flush=True)
    results = {}
    for mode, thresh in [("lazy", 1 << 62), ("row-update", 0)]:
        bundle = create_model("autoint", bucket_size=bucket)
        bundle.embedding.row_update_min_rows = thresh
        b, dense, labels, weight = synthetic_batch(bundle, batch_size, seed=0,
                                                   ids_per_feature=5)
        b = jax.device_put(b); labels = jax.device_put(labels)
        weight = jax.device_put(weight)
        state = create_train_state(bundle, jax.random.PRNGKey(0), b)
        step = make_train_step(bundle, donate=True, sparse_update="packed")
        rng = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        for _ in range(2):
            state, info = step(state, b, labels, weight, None, rng)
        fetch(info)
        print(f"  {mode}: warmup+compile {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, info = step(state, b, labels, weight, None, rng)
        loss = fetch(info)
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"  {mode:10s}: {ms:8.1f} ms/step ({batch_size/ms*1e3:,.0f} ex/s,"
              f" loss {loss:.4f})", flush=True)
        results[mode] = (ms, loss)
        del state
    lm, ll = results["lazy"]
    rm, rl = results["row-update"]
    print(f"  => row-update is {lm/rm:.2f}x vs lazy; loss delta {abs(rl-ll):.2e}",
          flush=True)

bench(4_000_000, 32768)     # 96M rows total
bench(265_000, 65536)       # 6.4M rows (headline config)
bench(4_000_000, 8192)      # 96M rows, small batch (serving-adjacent regime)
