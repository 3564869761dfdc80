"""Tensor (model-axis) parallelism and FSDP-style state sharding.

The reference is strictly single-GPU (SURVEY.md §2c: no DP/TP/PP of any
kind — device selection is a CUDA_VISIBLE_DEVICES string,
``utils.py:98-124``). pdc_tpu's data-parallel and pixel-sharded paths live
in :mod:`pdc_tpu.parallel.sharded_train`; this module adds the two
remaining mesh axes sketched in SURVEY.md §2c ("optional ('data','model')"):

* **Tensor parallelism (TP)** — conv kernels are sharded on their output-
  channel axis over a ``model`` mesh axis (Megatron column-parallel, the
  CNN analog), per-channel parameters (BN scale/bias/stats, conv bias)
  shard alongside.  GSPMD propagates the channel sharding through the
  network and inserts the activation all-gathers over ICI; no model code
  changes, no hand-written collectives.  Each chip holds 1/n of the
  weights and computes 1/n of every conv's output channels.
* **FSDP / ZeRO-style sharding** — parameters, Adam moments, and batch
  stats are sharded over the ``data`` axis (each chip stores 1/n of the
  training state); XLA all-gathers weights for compute and reduce-scatters
  gradients, exactly the ZeRO-3 schedule, derived entirely from the
  in/out shardings of one jitted step.

Both paths compute the same math as the replicated step (per-output-
channel conv results are untouched by Cout sharding; FSDP only re-tiles
storage) and are asserted against it on the virtual 8-device CPU mesh in
``tests/test_tensor_parallel.py`` and ``__graft_entry__.dryrun_multichip``.
Agreement is exact up to XLA's partitioning-schedule float reassociation:
forward/loss to ~1e-6, gradients to ~1-2% Frobenius (reassociation noise
flips ReLU masks for near-zero activations) — the same envelope measured
between the shipped replicated-DP step and a single-device step.

For a 21M-parameter ResNet-34 neither axis is needed for memory — they are
here so the framework's mesh story covers dp/tp/sp/fsdp for larger
descriptor backbones (ResNet-101-8s at high descriptor dimension, or
serving many models per chip).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pdc_tpu.data.assembler import AssemblerConfig
from pdc_tpu.losses.pixelwise_contrastive import LossConfig
from pdc_tpu.training.train import TrainState


def channel_shardings(tree: Any, mesh: Mesh, axis: str = "model"):
    """Per-leaf channel shardings for a params/variables/state pytree.

    Rule: 4-D conv kernels ``[kh, kw, Cin, Cout]`` shard on Cout; 1-D
    per-channel vectors (BN scale/bias/stats, conv bias) shard on their
    only axis; anything whose candidate axis is not divisible by the mesh
    axis size (e.g. the D=3 descriptor head) stays replicated — mixing
    replicated leaves in is fine, GSPMD reshards at use sites.
    """
    n = mesh.shape[axis]

    def rule(leaf):
        shp = jnp.shape(leaf)
        if len(shp) == 4 and shp[3] % n == 0 and shp[3] >= n:
            return NamedSharding(mesh, P(None, None, None, axis))
        if len(shp) == 1 and shp[0] % n == 0 and shp[0] >= n:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = "data"):
    """ZeRO-style storage shardings: every leaf is sharded on its
    :func:`best_shard_axis` (replicated when none is divisible).

    Unlike :func:`channel_shardings` this is purely a storage layout — XLA
    all-gathers leaves at their use sites and reduce-scatters gradients, so
    any divisible axis is correct; the largest one gives the most even
    per-chip memory split.
    """
    n = mesh.shape[axis]

    def rule(leaf):
        shp = jnp.shape(leaf)
        best = best_shard_axis(shp, n)
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shp)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(rule, tree)


def best_shard_axis(shape, n: int):
    """The largest axis of ``shape`` divisible by ``n`` (None when none is) —
    the per-leaf storage split both :func:`fsdp_shardings` (GSPMD layout)
    and the manual shard_map ZeRO path in ``training/scanned.py`` use."""
    for i in sorted(range(len(shape)), key=lambda j: -shape[j]):
        if shape[i] % n == 0 and shape[i] >= n:
            return i
    return None


def tree_shard_axes(tree: Any, n: int):
    """Pytree of :func:`best_shard_axis` results for every leaf."""
    return jax.tree.map(lambda l: best_shard_axis(jnp.shape(l), n), tree)


def tree_shard_specs(tree: Any, n: int, axis_name: str):
    """PartitionSpec pytree splitting every leaf on its
    :func:`best_shard_axis` (for ``shard_map`` in/out_specs)."""

    def spec(leaf):
        shp = jnp.shape(leaf)
        ax = best_shard_axis(shp, n)
        if ax is None:
            return P()
        parts = [None] * len(shp)
        parts[ax] = axis_name
        return P(*parts)

    return jax.tree.map(spec, tree)


def tree_all_gather(tree: Any, axes: Any, axis_name: str):
    """Reassemble full leaves from per-chip shards inside ``shard_map``
    (tiled all-gather on each leaf's shard axis; replicated leaves pass
    through)."""
    return jax.tree.map(
        lambda l, ax: l if ax is None else jax.lax.all_gather(
            l, axis_name, axis=ax, tiled=True),
        tree, axes)


def tree_reduce_scatter_mean(tree: Any, axes: Any, axis_name: str, n: int):
    """Cross-chip gradient mean, scattered back to each leaf's shard (the
    ZeRO reduce-scatter; replicated leaves get a plain pmean)."""
    return jax.tree.map(
        lambda l, ax: (jax.lax.pmean(l, axis_name) if ax is None else
                       jax.lax.psum_scatter(
                           l, axis_name, scatter_dimension=ax, tiled=True) / n),
        tree, axes)


def scan_fsdp_setup(model, tx, mesh: Mesh, data_axis: str, image_hw):
    """Shared setup for the scanned ZeRO paths in ``training/scanned.py``:
    per-leaf shard axes for the manual all-gather/reduce-scatter, and the
    ``shard_map`` state specs (params + optimizer moments sharded,
    batch stats + step replicated). Derived from ``jax.eval_shape`` so no
    concrete state is needed at factory time.

    :return: ``(p_axes, state_specs)``.
    """
    n = mesh.shape[data_axis]
    H, W = image_hw
    v_shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, H, W, 3), jnp.float32),
                             train=False),
        jax.random.PRNGKey(0))
    p_axes = tree_shard_axes(v_shapes["params"], n)
    state_specs = TrainState(
        step=P(),
        params=tree_shard_specs(v_shapes["params"], n, data_axis),
        batch_stats=jax.tree.map(lambda _: P(), v_shapes["batch_stats"]),
        opt_state=tree_shard_specs(
            jax.eval_shape(tx.init, v_shapes["params"]), n, data_axis),
    )
    return p_axes, state_specs


def sharded_size_bytes(tree: Any, shardings: Any) -> int:
    """Per-device bytes of ``tree`` under ``shardings`` (for memory docs)."""
    total = 0
    for leaf, sh in zip(jax.tree.leaves(tree), jax.tree.leaves(shardings)):
        n = 1
        spec = sh.spec
        for i, name in enumerate(spec):
            if name is not None and i < leaf.ndim:
                n *= sh.mesh.shape[name]
        total += leaf.size * leaf.dtype.itemsize // n
    return total


def make_tp_inference(model, mesh: Mesh, model_axis: str = "model",
                      data_axis: str | None = None, normalize: bool = False):
    """Jitted descriptor forward with conv channels sharded over the model
    axis (and, on a 2-D mesh, the image batch over the data axis).

    :return: ``build(variables) -> (fwd, sharded_variables)`` — sharding
        the weights once up front; then ``fwd(sharded_variables, imgs)``.
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(data_axis)) if data_axis else repl

    def fwd(variables, imgs):
        out = model.apply(variables, imgs, train=False)
        if normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out

    def build(variables):
        sh = channel_shardings(variables, mesh, model_axis)
        variables_sh = jax.device_put(variables, sh)
        f = jax.jit(fwd, in_shardings=(sh, batch_sh), out_shardings=batch_sh)
        return f, variables_sh

    return build


def _make_state_sharded_train_step(model, tx, loss_cfg: LossConfig,
                                   assembler_cfg: AssemblerConfig,
                                   image_width: int, mesh: Mesh,
                                   state: TrainState, state_shardings,
                                   data_axis: str):
    """Common core: DP over ``data_axis`` with the train state laid out per
    ``state_shardings`` (channel-sharded for TP, storage-sharded for FSDP).
    The step body is the one DP step from
    :func:`pdc_tpu.parallel.sharded_train.make_sharded_train_step`."""
    from pdc_tpu.parallel.sharded_train import make_sharded_train_step

    jitted = make_sharded_train_step(
        model, tx, loss_cfg, assembler_cfg, image_width, mesh,
        state_shardings=state_shardings, data_axis=data_axis)
    return jitted, jax.device_put(state, state_shardings)


def make_tp_train_step(model, tx, loss_cfg: LossConfig,
                       assembler_cfg: AssemblerConfig, image_width: int,
                       mesh: Mesh, state: TrainState,
                       data_axis: str = "data", model_axis: str = "model"):
    """DP x TP train step on a 2-D ``(data, model)`` mesh: pairs sharded
    over ``data`` (gradient psum over ICI, as in
    :func:`pdc_tpu.parallel.sharded_train.make_sharded_train_step`) and the
    training state channel-sharded over ``model`` (each chip owns 1/n of
    every conv's output channels and their Adam moments).

    :return: ``(jitted_step, sharded_state)`` — feed the returned state in;
        the step keeps its output state in the same layout. The step
        DONATES its state input (and ``device_put`` may alias the original
        buffers), so treat the passed-in ``state`` as consumed and always
        continue from the returned one.
    """
    st_sh = channel_shardings(state, mesh, model_axis)
    return _make_state_sharded_train_step(
        model, tx, loss_cfg, assembler_cfg, image_width, mesh,
        state, st_sh, data_axis)


def make_fsdp_train_step(model, tx, loss_cfg: LossConfig,
                         assembler_cfg: AssemblerConfig, image_width: int,
                         mesh: Mesh, state: TrainState,
                         data_axis: str = "data"):
    """ZeRO-style data-parallel step on a 1-D mesh: pairs AND training
    state sharded over the same ``data`` axis. XLA all-gathers parameters
    at use sites and reduce-scatters gradients — per-chip state memory is
    1/n of the replicated layout with identical numerics.

    :return: ``(jitted_step, sharded_state)`` — as with
        :func:`make_tp_train_step`, the state input is donated; continue
        from the returned state.
    """
    st_sh = fsdp_shardings(state, mesh, data_axis)
    return _make_state_sharded_train_step(
        model, tx, loss_cfg, assembler_cfg, image_width, mesh,
        state, st_sh, data_axis)
