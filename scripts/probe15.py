"""Calibration probe: XLA vs Pallas streaming bandwidth + full-step reference,
all in ONE process (ambient chip throughput drifts ~3x between windows here,
so only same-process ratios are meaningful)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

def timeit(name, fn, *args, n=3):
    out = fn(*args); fetch(out)
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    f = fetch(out)
    dt = (time.perf_counter()-t0)/n
    print(f"{name:56s} {dt*1e3:9.2f} ms  (fetch={f:.5g})", flush=True)
    return dt

E, LANES = 1310720, 128
GB = E * LANES * 4 / 1e9

rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.standard_normal((E, LANES)), jnp.float32))
jax.block_until_ready(x)

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

# XLA full reduce: reads 671 MB
dt = timeit("XLA sum (671 MB read)", jax.jit(lambda a: a.sum()), x)
print(f"   -> {GB/dt:.0f} GB/s", flush=True)

# XLA copy: read + write
dt = timeit("XLA a+1 (671 MB r + 671 MB w)", jax.jit(lambda a: a + 1.0), x)
print(f"   -> {2*GB/dt:.0f} GB/s", flush=True)

# Pallas sum, various block sizes
for CS in (1024, 4096, 8192):
    def sum_kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += x_ref[:].reshape(CS // 8, 8, LANES).sum(axis=0)
    @jax.jit
    def ceiling(a):
        return pl.pallas_call(
            sum_kernel, grid=(E // CS,),
            in_specs=[pl.BlockSpec((CS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32))(a)
    dt = timeit(f"Pallas sum CS={CS} (671 MB read)", ceiling, x)
    print(f"   -> {GB/dt:.0f} GB/s", flush=True)

# Pallas sum with explicit multiple-buffering via pl.Buffered if available
try:
    CS = 8192
    def sum_kernel2(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += x_ref[:].reshape(CS // 8, 8, LANES).sum(axis=0)
    @jax.jit
    def ceiling2(a):
        return pl.pallas_call(
            sum_kernel2, grid=(E // CS,),
            in_specs=[pl.BlockSpec((CS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM,
                                   pipeline_mode=pl.Buffered(buffer_count=4))],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32))(a)
    dt = timeit("Pallas sum CS=8192 4-buffered", ceiling2, x)
    print(f"   -> {GB/dt:.0f} GB/s", flush=True)
except Exception as ex:
    print("buffered variant failed:", type(ex).__name__, str(ex)[:200], flush=True)

# full packed step for calibration vs the 273 ms morning window
from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step

bundle = create_model("autoint", bucket_size=265000)
batch, dense, labels, weight = synthetic_batch(bundle, 65536, seed=0,
                                               ids_per_feature=5)
batch = jax.device_put(batch); labels = jax.device_put(labels)
weight = jax.device_put(weight)
state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
rng_ = jax.random.PRNGKey(1)
step = make_train_step(bundle, donate=False, sparse_update="packed")
timeit("FULL packed step (calibration)", lambda: step(
    state, batch, labels, weight, None, rng_)[1]["loss"])
