"""Utility coverage: date helpers, mesh helpers, kernel flags."""

import jax
import numpy as np
import pytest

from recommendsystem_tpu.core.mesh import (create_mesh, data_sharding,
                                           num_virtual_cpu_devices,
                                           process_count, process_index,
                                           replicated, row_sharding)
from recommendsystem_tpu.kernels import interpret_mode, set_backend, use_pallas
from recommendsystem_tpu.utils import date_range, trained_delta_days


class TestDates:
    def test_date_range_inclusive(self):
        assert date_range("20260228", "20260302") == \
            ["20260228", "20260301", "20260302"]   # 2026 not a leap year

    def test_trained_delta_days(self):
        assert trained_delta_days("20260814", today="20260817") == \
            ["20260815", "20260816", "20260817"]
        assert trained_delta_days("20260817", today="20260817") == []
        assert trained_delta_days("20260820", today="20260817") == []

    def test_none_start_uses_window(self):
        days = trained_delta_days(None, today="20260817", max_days=3)
        assert days == ["20260815", "20260816", "20260817"]

    def test_max_days_caps(self):
        days = trained_delta_days("20260101", today="20260817", max_days=5)
        assert len(days) == 5 and days[-1] == "20260817"


class TestMesh:
    def test_single_process(self):
        assert process_count() == 1 and process_index() == 0

    def test_create_mesh_divisibility(self, cpu_devices):
        with pytest.raises(ValueError):
            create_mesh(cpu_devices[:6], model_parallel=4)
        m = create_mesh(cpu_devices[:8], model_parallel=4)
        assert dict(m.shape) == {"data": 2, "model": 4}

    def test_sharding_helpers(self, mesh8):
        assert data_sharding(mesh8).spec == jax.sharding.PartitionSpec("data")
        assert row_sharding(mesh8).spec == jax.sharding.PartitionSpec("data", None)
        assert replicated(mesh8).spec == jax.sharding.PartitionSpec()

    def test_num_virtual_cpu_devices(self):
        assert num_virtual_cpu_devices() == 8   # conftest sets the flag


class TestKernelFlags:
    def test_backend_override(self):
        try:
            set_backend("pallas")
            assert use_pallas()
            set_backend("xla")
            assert not use_pallas()
            with pytest.raises(ValueError):
                set_backend("cuda")
        finally:
            set_backend(None)
        assert not use_pallas()        # auto default is XLA (measured choice)
        assert interpret_mode()        # cpu backend -> interpret kernels
