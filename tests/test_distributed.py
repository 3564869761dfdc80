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

import numpy as np
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


TRAIN_WORKER = textwrap.dedent("""
    import json, os, sys

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, %r)
    from pdc_tpu.parallel.distributed import ensure_initialized

    assert ensure_initialized(coordinator_address=coord,
                              num_processes=2, process_id=pid)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.data.synthetic import make_orbit_pose
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.parallel.mesh import make_mesh
    from pdc_tpu.parallel.sharded_train import make_sharded_train_step
    from pdc_tpu.training.train import create_train_state

    H, W, B = 48, 64, 8
    mesh = make_mesh(("data",))  # all 8 GLOBAL devices, 4 per process
    config = {
        "training": {"learning_rate": 1e-3, "learning_rate_decay": 0.9,
                     "steps_between_learning_rate_decay": 250,
                     "weight_decay": 1e-4},
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet",
                         "resnet_name": "Resnet18_8s"},
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model, config, jax.random.PRNGKey(0),
                                   (H, W))
    # host-side pytree: jit places it per in_shardings on the global mesh
    # (identical on both processes by construction — same PRNG seed)
    state = jax.device_get(state)

    rng = np.random.RandomState(0)
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    full = {
        "match_type": np.zeros((B,), np.int32),
        "rgb_a": rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8),
        "depth_a": rng.randint(500, 2000, (B, H, W)).astype(np.uint16),
        "mask_a": (rng.rand(B, H, W) > 0.5).astype(np.uint8),
        "pose_a": np.stack([make_orbit_pose(0.3 * i).astype(np.float32)
                            for i in range(B)]),
        "rgb_b": rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8),
        "depth_b": rng.randint(500, 2000, (B, H, W)).astype(np.uint16),
        "mask_b": (rng.rand(B, H, W) > 0.5).astype(np.uint8),
        "pose_b": np.stack([make_orbit_pose(0.3 * i + 0.7).astype(np.float32)
                            for i in range(B)]),
        "K": np.stack([K] * B).astype(np.float32),
    }
    # each process contributes ITS 4 rows of the global batch
    sh = NamedSharding(mesh, P("data"))
    batch = {k: jax.make_array_from_process_local_data(
                 sh, v[pid * 4:(pid + 1) * 4], v.shape)
             for k, v in full.items()}

    step = make_sharded_train_step(
        model, tx, LossConfig(),
        AssemblerConfig(num_matching_attempts=64, masked_pool_size=32,
                        background_pool_size=32, num_blind_samples=16),
        W, mesh)
    new_state, metrics = step(state, batch, np.asarray(jax.random.PRNGKey(1)))
    print("RESULT " + json.dumps({"pid": pid,
                                  "loss": float(metrics["loss"]),
                                  "step": int(new_state.step)}))
""" % REPO)


@pytest.mark.slow
def test_two_process_dp_train_step(tmp_path):
    """A REAL data-parallel train step spanning 2 OS processes: the full
    sample→assemble→forward→loss→psum-grad→Adam program compiles and
    executes SPMD over the 8 global devices, and both processes observe
    the identical global loss — the strongest multi-host evidence
    available without pod hardware."""
    worker = tmp_path / "train_worker.py"
    worker.write_text(TRAIN_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, str(worker), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}
    assert results[0]["step"] == results[1]["step"] == 1
    assert results[0]["loss"] == results[1]["loss"]
    assert np.isfinite(results[0]["loss"])


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
