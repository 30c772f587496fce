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
# IDS: "N" for uniform N ids/feature, "realistic" for mostly-single-valued
# VarLen widths (the production regime bench.py --realistic-ids measures)
IDS = os.environ.get("IDS", "5")
ids_per_feature = {} if IDS == "realistic" else int(IDS)

if MODEL == "ctr_production212":
    from recommendsystem_tpu.models.ctr import production_ctr
    bundle = production_ctr("/root/reference/rank/ctr/model_parameter.json",
                            bucket_size=int(os.environ.get("BUCKET", 32768)))
elif MODEL == "staytime":
    bundle = create_model(MODEL)   # staytime fixes its own buckets (81920)
else:
    bundle = create_model(MODEL, bucket_size=int(os.environ.get("BUCKET", 265000)))
batch, dense, labels, weight = synthetic_batch(bundle, BATCH, seed=0,
                                               ids_per_feature=ids_per_feature)
batch = jax.device_put(batch); labels = jax.device_put(labels)
weight = jax.device_put(weight)
dense = jax.device_put(dense) if dense is not None else None
state = create_train_state(bundle, jax.random.PRNGKey(0), batch, dense)
rng = jax.random.PRNGKey(1)
# donated, threaded state: the production212 table state (~6.6 GB w+m+v)
# doesn't fit HBM twice, and donation is the production driver's regime
step = make_train_step(bundle, donate=True, sparse_update=SPARSE)

def fetch(x):
    return float(jax.tree.leaves(x)[0].ravel()[-1])

t0 = time.perf_counter()
for _ in range(2):
    state, info = step(state, batch, labels, weight, dense, rng)
fetch(info)
print(f"warmup+compile: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(5):
    state, info = step(state, batch, labels, weight, dense, rng)
fetch(info)
step_ms = (time.perf_counter() - t0) / 5 * 1e3
print(f"fetch-verified step: {step_ms:.1f} ms ({BATCH/step_ms*1e3:,.0f} ex/s)",
      flush=True)

tdir = "/tmp/trace_step"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(3):
        state, info = step(state, batch, labels, weight, dense, rng)
    fetch(info)

# parse: find trace.json.gz
paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, flush=True)
agg = collections.Counter()
cnt = collections.Counter()
names = {}
by_source = collections.Counter()
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
            src = str(args.get("source", "?"))
            # strip to the repo-relative engine line: .../recommendsystem_tpu/x.py:N
            i = src.find("recommendsystem_tpu/")
            by_source[src[i:] if i >= 0 else src] += ev.get("dur", 0)

tot = sum(agg.values())
print(f"\ntotal device-op time: {tot/1e6:.1f} ms over 3 steps -> {tot/3e6:.1f} ms/step")
print(f"{'op':44s} {'ms/step':>9s} {'n':>5s}")
for name, dur in agg.most_common(40):
    print(f"{name[:44]:44s} {dur/3e6:9.2f} {cnt[name]//3:5d}  {names.get(name,'')[:90]}")

print(f"\nper-source budget (engine line that emitted each fusion):")
print(f"{'source':64s} {'ms/step':>9s}")
for src, dur in by_source.most_common(40):
    print(f"{src[:64]:64s} {dur/3e6:9.2f}")
