"""Honest train-step timing of a zoo model on the real chip.

Usage: python scripts/step_time.py [model] [batch] [steps] [--scan K]
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step, make_scan_train_step

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "autoint"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scan = int(sys.argv[sys.argv.index("--scan") + 1]) if "--scan" in sys.argv else 0
    kw = {"bucket_size": 265000} if model in ("autoint", "ctr", "multi_head") else {}
    bundle = create_model(model, **kw)
    b, dense, labels, weight = synthetic_batch(bundle, batch_size, seed=0,
                                               ids_per_feature=5)
    b = jax.device_put(b); labels = jax.device_put(labels)
    weight = jax.device_put(weight)
    dense = jax.device_put(dense) if dense is not None else None
    state = create_train_state(bundle, jax.random.PRNGKey(0), b, dense)
    rng = jax.random.PRNGKey(1)
    if scan:
        K = scan
        tile = lambda t: jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x)[None], (K,) + jnp.asarray(x).shape), t)
        sb, sl, sw = tile(b), tile(labels), tile(weight)
        sd = tile(dense) if dense is not None else None
        rngs = jax.random.split(rng, K)
        step = make_scan_train_step(bundle)
        state, info = step(state, sb, sl, sw, sd, rngs); fetch(info)
        for w in range(3):
            t0 = time.perf_counter()
            state, info = step(state, sb, sl, sw, sd, rngs)
            loss = fetch(info)
            dt = time.perf_counter() - t0
            print(f"{model} scan[{K}] b={batch_size}: {dt/K*1e3:.1f} ms/step "
                  f"-> {batch_size*K/dt:,.0f} ex/s (loss {loss:.4f})", flush=True)
        return
    step = make_train_step(bundle, donate=False)
    for _ in range(2):
        st2, info = step(state, b, labels, weight, dense, rng)
    fetch(info)
    for w in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            st2, info = step(st2, b, labels, weight, dense, rng)
        loss = fetch(info)
        dt = (time.perf_counter() - t0) / steps
        print(f"{model} b={batch_size}: {dt*1e3:.1f} ms/step -> "
              f"{batch_size/dt:,.0f} ex/s (loss {loss:.4f})", flush=True)

if __name__ == "__main__":
    main()
