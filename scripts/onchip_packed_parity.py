"""On-chip parity: packed fold/unfold Pallas kernels (from-ids, l-major
4-D blocks) vs the jnp reference, across the (L, D) shapes the zoo uses.  Writes the
worst-case relative error to ONCHIP_PARITY.json at the repo root (the
per-round recorded gate — VERDICT r3 #6); the same checks run in-suite on
TPU backends (tests/test_packed.py::test_tpu_kernels_match_reference)."""
import json, os, sys
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
for (c, l, d, b) in [(4, 5, 8, 1024), (4, 5, 8, 16384), (1, 1, 8, 8192),
                     (2, 3, 16, 3072), (1, 5, 48, 2048), (1, 2, 32, 5000),
                     (3, 7, 8, 713), (1, 93, 8, 1024), (1, 2, 96, 2048),
                     (1, 3, 127, 1024)]:
    x = c * b
    e = x * l
    ids = jnp.asarray(rng.integers(0, 1 << 20, size=e).astype(np.int32))
    mask = jnp.asarray((rng.random(e) > 0.3).astype(np.float32))
    wide = jnp.asarray(rng.standard_normal((e, 128)), jnp.float32)
    wide_bf16 = wide.astype(jnp.bfloat16)
    gx = jnp.asarray(rng.standard_normal((x, d)), jnp.float32)
    g_rows = jnp.asarray(rng.standard_normal((e, d)), jnp.float32)

    pairs = [
        ("fold_mean", jax.jit(lambda w, i, m: pk.fold_mean(w, i, m, c, l, d)),
         jax.jit(lambda w, i, m: pk.fold_mean_ref(w, i, m, c, l, d)),
         (wide, ids, mask)),
        # scatter-packing folds (the packed-STATE gather path, round 5)
        ("fold_mean_sc",
         jax.jit(lambda w, i, m: pk.fold_mean(w, i, m, c, l, d, "scatter")),
         jax.jit(lambda w, i, m: pk.fold_mean_ref(w, i, m, c, l, d, "scatter")),
         (wide, ids, mask)),
        ("fold_rows_sc",
         jax.jit(lambda w, i, m: pk.fold_rows(w, i, m, d, "scatter")),
         jax.jit(lambda w, i, m: pk.fold_rows_ref(w, i, m, d, "scatter")),
         (wide, ids, mask)),
        ("unfold_mean", jax.jit(lambda g, i, m: pk.unfold_mean(g, i, m, c, l)),
         jax.jit(lambda g, i, m: pk.unfold_mean_ref(g, i, m, c, l)),
         (gx, ids, mask)),
        ("fold_rows", jax.jit(lambda w, i, m: pk.fold_rows(w, i, m, d)),
         jax.jit(lambda w, i, m: pk.fold_rows_ref(w, i, m, d)),
         (wide, ids, mask)),
        ("unfold_rows", jax.jit(pk.unfold_rows),
         jax.jit(pk.unfold_rows_ref), (g_rows, ids, mask)),
        ("fold_mean_bf16",
         jax.jit(lambda w, i, m: pk.fold_mean(w, i, m, c, l, d)),
         jax.jit(lambda w, i, m: pk.fold_mean_ref(w, i, m, c, l, d)),
         (wide_bf16, ids, mask)),
    ]
    for name, tpu_fn, ref_fn, args in pairs:
        got = np.asarray(tpu_fn(*args))
        ref = np.asarray(ref_fn(*args))
        err = float(np.max(np.abs(got - ref)))
        scale = float(np.max(np.abs(ref))) + 1e-9
        rel = err / scale
        worst = max(worst, rel)
        status = "OK " if rel < 1e-5 else "FAIL"
        print(f"{status} c={c} l={l} d={d} b={b:6d} {name:12s} "
          f"max_abs={err:.3e} rel={rel:.3e}", flush=True)

# flash field attention (round 5): fwd + custom-bwd vs the jnp reference,
# at the ctr-production and headline field counts
from recommendsystem_tpu.kernels.field_attention_pallas import (
    field_attention, field_attention_reference)
for (h, dh, f, b) in [(2, 4, 175, 256), (2, 4, 24, 512), (1, 8, 93, 128)]:
    q, k, v, g = (jnp.asarray(rng.standard_normal((h, dh, f, b)), jnp.float32)
                  for _ in range(4))
    got = np.asarray(jax.jit(lambda *a: field_attention(*a, 0, 0.0))(q, k, v))
    ref = np.asarray(field_attention_reference(q, k, v))
    rel = float(np.max(np.abs(got - ref))) / (float(np.max(np.abs(ref))) + 1e-9)
    worst = max(worst, rel)
    print(f"{'OK ' if rel < 1e-5 else 'FAIL'} flash fwd h={h} dh={dh} f={f} "
          f"b={b} rel={rel:.3e}", flush=True)
    gk = jax.jit(jax.grad(lambda *a: jnp.sum(field_attention(*a, 0, 0.0) * g),
                          argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(field_attention_reference(*a) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for n2, a, b2 in zip("qkv", gk, gr):
        rel = float(np.max(np.abs(np.asarray(a) - np.asarray(b2)))) /             (float(np.max(np.abs(np.asarray(b2)))) + 1e-9)
        worst = max(worst, rel)
        print(f"{'OK ' if rel < 1e-5 else 'FAIL'} flash d{n2} f={f} "
              f"rel={rel:.3e}", flush=True)

print(f"worst rel err = {worst:.3e}")
with open(os.path.join(REPO, "ONCHIP_PARITY.json"), "w") as fh:
    json.dump({"worst_rel_err": worst, "ok": bool(worst < 1e-5),
               "device": str(jax.devices()[0]),
               "kernels": ["fold_mean", "unfold_mean", "fold_rows",
                           "unfold_rows", "fold_mean_sc", "fold_rows_sc",
                           "field_attention"]}, fh, indent=1)
assert worst < 1e-5, worst
print("ALL PARITY OK")
