"""Multi-host (DCN) entry path: jax.distributed gating + rank-0 I/O.

The reference runs multi-node MPI as a matter of course (main.f90:13,
VARDEN-tests.ini mpiexec); the TPU-native equivalent is jax.distributed
over DCN. Real multi-host needs a pod slice this image lacks, so these
tests pin the gating contract: no env -> no-op; coordinator env -> a
jax.distributed.initialize call with the right arguments."""
import jax
import pytest

from varden_tpu.parallel import mesh as pmesh


def test_no_env_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("VARDEN_COORDINATOR", raising=False)
    assert pmesh.maybe_init_distributed() is False


def test_coordinator_env_initializes(monkeypatch):
    calls = []
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    assert pmesh.maybe_init_distributed() is True
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 2}]


def test_already_initialized_short_circuits(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert pmesh.maybe_init_distributed() is True
    assert called == []


def test_io_proc_gating(monkeypatch):
    assert pmesh.is_io_proc()  # single process
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert not pmesh.is_io_proc()
