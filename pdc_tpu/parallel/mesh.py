"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2c: device
selection is a CUDA_VISIBLE_DEVICES string, batch locked to 1). Here
multi-chip is first-class: a ``jax.sharding.Mesh`` with a ``data`` axis for
pair-parallel training (gradient psum over ICI, inserted by GSPMD) and an
optional ``model`` axis reserved for pixel-axis sharding of the best-match /
statistics paths.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    With the default single axis, all devices go to data parallelism. Pass
    ``shape=(n_data, n_model)`` with ``axis_names=("data", "model")`` for a
    2-D layout.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    assert shape is not None, "give an explicit shape for multi-axis meshes"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def get_shard_map():
    """``jax.shard_map`` with replication checking off, compatible across
    the kwarg rename (check_vma, formerly check_rep)."""
    import functools
    import inspect

    from jax import shard_map

    params = inspect.signature(shard_map).parameters
    kw = "check_vma" if "check_vma" in params else "check_rep"
    return functools.partial(shard_map, **{kw: False})


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the mesh's data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
