"""Multi-process runtime helpers (single-process behavior + mesh shapes)."""
import jax
import numpy as np

from sonic_tpu.parallel import distributed


def test_initialize_single_process_noop(monkeypatch):
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.append(kw)
    )
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    distributed.initialize()
    assert called == []


def test_initialize_passes_env(monkeypatch):
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.append(kw)
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    distributed.initialize()
    assert called == [
        {
            "coordinator_address": "10.0.0.1:1234",
            "num_processes": 4,
            "process_id": 2,
        }
    ]


def test_global_mesh_covers_all_devices():
    mesh = distributed.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("shard",)


def test_host_slice_mesh_shape():
    mesh = distributed.host_slice_mesh()
    assert mesh.axis_names == ("dcn", "ici")
    assert mesh.devices.shape[0] == jax.process_count()
    assert mesh.devices.size == len(jax.devices())
