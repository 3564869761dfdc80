"""Multi-process jax.distributed bootstrap (round-3 directive #3): the one
§2c component whose core path never executed before — exercised here with
REAL processes (localhost coordinator, 2 processes x 4 virtual CPU devices),
plus env-var mocking for the pod-detection heuristic."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

import pdc_tpu.parallel.distributed as dist

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json, os, sys

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, %r)
    from pdc_tpu.parallel.distributed import (
        ensure_initialized, local_scene_subset, process_info)

    active = ensure_initialized(coordinator_address=coord,
                                num_processes=2, process_id=pid)
    assert active, "distributed runtime should be active with 2 processes"
    info = process_info()
    assert info["process_count"] == 2, info
    assert info["local_device_count"] == 4, info
    assert info["global_device_count"] == 8, info

    # one psum across the 8 GLOBAL devices: every device contributes
    # (process_id + 1), so the all-reduced sum must be 4*1 + 4*2 = 12
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("d",))
    sharding = NamedSharding(mesh, P("d"))
    local = np.full((4,), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local, (8,))
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(total) == 12.0, float(total)

    scenes = [f"scene_{i:03d}" for i in range(5)]
    mine = local_scene_subset(scenes)
    print("RESULT " + json.dumps({"pid": pid, "scenes": mine,
                                  "psum": float(total)}))
""" % REPO)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_bootstrap_and_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, str(worker), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}
    # every worker saw the same global psum over 8 devices
    assert results[0]["psum"] == results[1]["psum"] == 12.0
    # local_scene_subset partitions the scene list disjointly + completely
    s0, s1 = set(results[0]["scenes"]), set(results[1]["scenes"])
    assert s0.isdisjoint(s1)
    assert s0 | s1 == {f"scene_{i:03d}" for i in range(5)}


def _reset_module(monkeypatch):
    monkeypatch.setattr(dist, "_initialized", False)


def test_pod_heuristic_triggers_initialize(monkeypatch):
    """TPU_WORKER_HOSTNAMES with 2+ hosts -> auto jax.distributed.initialize
    (no kwargs: the TPU metadata supplies the topology)."""
    _reset_module(monkeypatch)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    calls = []
    monkeypatch.setattr(dist.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setattr(dist.jax, "process_count", lambda: 2)
    monkeypatch.setattr(dist.jax, "process_index", lambda: 0)
    monkeypatch.setattr(dist.jax, "local_device_count", lambda: 4)
    monkeypatch.setattr(dist.jax, "device_count", lambda: 8)
    assert dist.ensure_initialized() is True
    assert calls == [{}]


def test_single_host_hostnames_skip(monkeypatch):
    """A single-host TPU VM also sets TPU_WORKER_HOSTNAMES (no comma) — must
    NOT trigger multi-process init."""
    _reset_module(monkeypatch)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    called = []
    monkeypatch.setattr(dist.jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert dist.ensure_initialized() is False
    assert called == []


def test_env_var_opt_in(monkeypatch):
    """JAX_NUM_PROCESSES set -> initialize() with env-supplied topology."""
    _reset_module(monkeypatch)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    calls = []
    monkeypatch.setattr(dist.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setattr(dist.jax, "process_count", lambda: 2)
    monkeypatch.setattr(dist.jax, "process_index", lambda: 1)
    monkeypatch.setattr(dist.jax, "local_device_count", lambda: 4)
    monkeypatch.setattr(dist.jax, "device_count", lambda: 8)
    assert dist.ensure_initialized() is True
    assert calls == [{}]


def test_idempotent(monkeypatch):
    _reset_module(monkeypatch)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert dist.ensure_initialized() is False
    # second call short-circuits without re-reading env
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    assert dist.ensure_initialized() is False
