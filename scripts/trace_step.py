"""Trace the packed headline step and print the top ops by device time.
Durations in the chrome trace on this platform are ns (CLAUDE.md)."""
import os, sys, time, glob, gzip, json, collections
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import create_train_state
from recommendsystem_tpu.train.step import make_train_step

BATCH = int(os.environ.get("BATCH", 65536))
MODEL = os.environ.get("MODEL", "autoint")
SPARSE = os.environ.get("SPARSE", "packed")

bundle = create_model(MODEL, bucket_size=265000)
batch, dense, labels, weight = synthetic_batch(bundle, BATCH, seed=0,
                                               ids_per_feature=5)
batch = jax.device_put(batch); labels = jax.device_put(labels)
weight = jax.device_put(weight)
state = create_train_state(bundle, jax.random.PRNGKey(0), batch)
rng = jax.random.PRNGKey(1)
step = make_train_step(bundle, donate=False, sparse_update=SPARSE)

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

for _ in range(2):
    s2, info = step(state, batch, labels, weight, None, rng)
fetch(info)

tdir = "/tmp/trace_step"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(3):
        s2, info = step(state, batch, labels, weight, None, rng)
    fetch(info)

# parse: find trace.json.gz
paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, flush=True)
agg = collections.Counter()
cnt = collections.Counter()
names = {}
for p in paths:
    with gzip.open(p, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        args = ev.get("args", {}) or {}
        # device op events carry long_name/source args
        if "long_name" in args or "source" in args or name.startswith("fusion") \
           or "tpu_custom_call" in name or name.startswith(("copy", "scatter", "dynamic", "gather", "reduce", "convert", "select", "transpose", "broadcast", "dot", "iota", "concatenate", "slice", "bitcast", "add", "multiply", "pad", "reshape")):
            agg[name] += ev.get("dur", 0)
            cnt[name] += 1
            if "long_name" in args and name not in names:
                names[name] = str(args.get("long_name"))[:160]

tot = sum(agg.values())
print(f"\ntotal device-op time: {tot/1e6:.1f} ms over 3 steps -> {tot/3e6:.1f} ms/step")
print(f"{'op':44s} {'ms/step':>9s} {'n':>5s}")
for name, dur in agg.most_common(40):
    print(f"{name[:44]:44s} {dur/3e6:9.2f} {cnt[name]//3:5d}  {names.get(name,'')[:90]}")
