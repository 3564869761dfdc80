"""Multi-host (multi-process) runtime initialization.

The reference has no distributed communication backend at all (SURVEY §2c:
no NCCL/MPI/Gloo; GPU choice is an env-var string). The TPU-native
equivalent is ``jax.distributed.initialize`` + GSPMD collectives over
ICI/DCN — this module is the process-bootstrap layer the round-1 build left
unwired:

  * on Cloud TPU pods, ``jax.distributed.initialize()`` discovers the
    coordinator and process topology from the TPU metadata automatically
  * on arbitrary clusters, pass coordinator_address/num_processes/process_id
    (or set the standard JAX_* env vars)
  * single-process runs (tests, one chip, CPU) skip initialization and work
    unchanged — the same training entry points serve both

After :func:`ensure_initialized`, ``jax.devices()`` spans the whole slice,
so ``make_mesh()`` + the sharded/scanned train steps
(:mod:`pdc_tpu.training.scanned`, :mod:`pdc_tpu.parallel.sharded_train`)
become pod-global without code changes; per-host input sharding comes from
:class:`pdc_tpu.data.device_cache.ShardedDeviceCache` (whole scenes per
chip) or per-host scene lists via :func:`local_scene_subset`.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_initialized = False


def ensure_initialized(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> bool:
    """Initialize the multi-process JAX runtime exactly once.

    :return: True when the distributed runtime is active (more than one
        process), False for the single-process fallback.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    env_procs = os.environ.get("JAX_NUM_PROCESSES")
    explicit = coordinator_address is not None or num_processes is not None
    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES", "").strip()
                  and "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""))

    if not (explicit or env_procs or on_pod):
        logger.info("single-process run; skipping jax.distributed.initialize")
        _initialized = True
        return False

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d, %d local / %d "
                "global devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return jax.process_count() > 1


def process_info() -> dict:
    """Topology snapshot for logging/checkpoint metadata."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def local_scene_subset(scene_names, process_index: Optional[int] = None,
                       process_count: Optional[int] = None):
    """Deterministic per-host scene split (SURVEY §2c host-pipeline row):
    host i streams/decodes only its own scenes, so PNG decode and host->HBM
    transfer scale with the pod instead of replicating work.

    :param scene_names: iterable of scene names (ordering normalized)
    :return: the sorted sublist owned by this process
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    names = sorted(scene_names)
    return names[process_index::process_count]
