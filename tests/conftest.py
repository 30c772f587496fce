"""Test harness setup.

Tests run on an 8-virtual-device CPU mesh (SURVEY §4): multi-host behaviour is
simulated with ``--xla_force_host_platform_device_count=8``.  The container
pins JAX to the single-TPU ``axon`` platform via a sitecustomize that imports
jax before any test code runs; backends are not yet materialized at that
point, so switching with ``jax.config.update`` here still works.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

# TF parity tests: oneDNN kernels corrupt/abort 4-D matmuls when JAX-CPU is
# active in the same process — must be off before ANY test imports tensorflow
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite compiles the big models (staytime,
# ctr) many times across test processes; disk-cached executables cut repeat
# suite time dramatically
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs


@pytest.fixture(scope="session")
def mesh8(cpu_devices):
    from recommendsystem_tpu.core import create_mesh
    return create_mesh(cpu_devices[:8])
