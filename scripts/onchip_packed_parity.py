"""On-chip parity: packed fold/unfold Pallas kernels (incl. the 3-D block
variants) vs the jnp reference, across the (L, D) shapes the zoo uses."""
import os, sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.embedding import packed as pk

print("devices:", jax.devices(), flush=True)
assert pk.on_tpu(), "must run on the TPU chip"

rng = np.random.default_rng(0)
worst = 0.0
for (l, d, x) in [(5, 8, 4096), (5, 8, 65536), (1, 8, 8192), (3, 16, 6144),
                  (5, 48, 2048), (2, 32, 10000), (7, 8, 4999)]:
    e = x * l
    ids = rng.integers(0, 1 << 20, size=e).astype(np.int64)
    mask = (rng.random(e) > 0.3).astype(np.float32)
    ohm = jax.jit(lambda i, m: pk.build_ohm(i, m, d))(
        jnp.asarray(ids), jnp.asarray(mask))
    wide = jnp.asarray(rng.standard_normal((e, 128)), jnp.float32)
    gx = jnp.asarray(rng.standard_normal((x, d)), jnp.float32)
    g_rows = jnp.asarray(rng.standard_normal((e, d)), jnp.float32)

    pairs = [
        ("fold_mean", jax.jit(lambda w, o: pk.fold_mean_tpu(w, o, l, d)),
         jax.jit(lambda w, o: pk.fold_mean_ref(w, o, l, d)), (wide, ohm)),
        ("unfold_mean", jax.jit(lambda g, o: pk.unfold_mean_tpu(g, o, l)),
         jax.jit(lambda g, o: pk.unfold_mean_ref(g, o, l)), (gx, ohm)),
        ("fold_rows", jax.jit(lambda w, o: pk.fold_rows_tpu(w, o, d)),
         jax.jit(lambda w, o: pk.fold_rows_ref(w, o, d)), (wide, ohm)),
        ("unfold_rows", jax.jit(pk.unfold_rows_tpu),
         jax.jit(pk.unfold_rows_ref), (g_rows, ohm)),
    ]
    for name, tpu_fn, ref_fn, args in pairs:
        a = np.asarray(tpu_fn(*args))
        b = np.asarray(ref_fn(*args))
        err = float(np.max(np.abs(a - b)))
        scale = float(np.max(np.abs(b))) + 1e-9
        rel = err / scale
        worst = max(worst, rel)
        status = "OK " if rel < 1e-5 else "FAIL"
        print(f"{status} l={l} d={d} x={x:6d} {name:12s} "
              f"max_abs={err:.3e} rel={rel:.3e}", flush=True)

print(f"worst rel err = {worst:.3e}")
assert worst < 1e-5, worst
print("ALL PARITY OK")
