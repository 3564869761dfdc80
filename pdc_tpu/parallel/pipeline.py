"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference is strictly single-GPU (SURVEY.md §2c — no DP/TP/PP of any
kind); pdc_tpu's mesh menu already covers DP (``sharded_train``), TP and
FSDP/ZeRO (``tensor_parallel``), and pixel-axis sharding. This module adds
the last classic axis: **inter-stage pipelining**, where the ResNet FCN is
partitioned into contiguous stage groups, each group's parameters live on a
different slice of a ``pipe`` mesh axis, and microbatches flow through the
classic GPipe schedule (Huang et al., 2019): at tick ``t`` stage ``s``
processes microbatch ``t - s``, activations hop stage→stage over ICI via
``lax.ppermute``. The backward pass needs no hand-written schedule — JAX
differentiates through the ``scan``/``ppermute`` program, and the transpose
of a ``ppermute`` is the reverse ``ppermute``, which IS the reverse-order
pipeline.

TPU-native design notes:

* **SPMD with heterogeneous stages.** ``shard_map`` runs one program on
  every device, but ResNet stages have different parameter structures and
  activation shapes. Both are made uniform by *flat packing*: each stage's
  parameter pytree is raveled into one fp32 vector, padded to the longest
  stage, and stacked to ``[S, Pmax]`` — sharded ``P("pipe", None)`` so each
  chip stores exactly its own stage's weights (1/S-ish of the model, the
  memory property PP exists for). Activations ride a padded ``[mb, Amax]``
  buffer through ``ppermute``; ``lax.switch`` on ``axis_index("pipe")``
  picks the stage body, and each branch statically unflattens its slice of
  the parameter row and reshapes its slice of the activation buffer.
* **BatchNorm semantics.** The pipelined step runs BN with *running
  statistics* (``use_running_average=True``). Per-microbatch train-mode BN
  statistics are exactly the GPipe paper's BN caveat; freezing the stats
  makes the pipelined loss *bit-equivalent* (up to float reassociation) to
  a single-device frozen-BN step, which is what the equivalence tests
  assert. This matches the dominant PP use case — fine-tuning a pretrained
  backbone too large to replicate.
* **Optimizer on the packed representation.** Adam/AdamW are elementwise,
  so running optax directly on the ``[S, Pmax]`` buffer is mathematically
  identical to running it leaf-wise (padding lanes carry zero params and
  zero grads, so their updates are identically zero). Batch stats are
  packed in a SEPARATE stacked buffer that the optimizer never touches.
* A 21M-parameter ResNet-34 never *needs* PP — like the TP axis, this
  completes the dp/tp/pp/sp mesh story for larger descriptor backbones
  (ResNet-101-8s bottlenecks at high D) and is verified for program
  correctness on the virtual mesh (``tests/test_pipeline_parallel.py``,
  ``__graft_entry__.dryrun_multichip`` check #9). Expert parallelism (EP)
  has no analog here — the network is a dense CNN with no routed experts;
  per SURVEY.md §5 we say so rather than invent one (docs/scaling.md).

The 4 base segments (balanced to put the two dilated, FLOP-dominant stages
on their own chips) are::

    seg0: stem conv + BN + maxpool + stage1      [B, H/4, W/4, 64]
    seg1: stage2                                 [B, H/8, W/8, 128]
    seg2: stage3 (dilation 2)                    [B, H/8, W/8, 256]
    seg3: stage4 (dilation 4) + head + upsample  [B, H, W, D]

A ``pipe`` axis of size 1, 2, or 4 groups them contiguously.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pdc_tpu.models.resnet import (
    BasicBlock,
    BottleneckBlock,
    ResNetFCN,
    _resize_bilinear,
)
from pdc_tpu.parallel.mesh import get_shard_map


# ---------------------------------------------------------------------------
# Stage partitioning: the 4 base segments and their per-segment apply fns
# ---------------------------------------------------------------------------

_FEATURES = (64, 128, 256, 512)
_STRIDES = (1, 2, 1, 1)      # output-stride-8 layout (ResNetFCN.__call__)
_DILATIONS = (1, 1, 2, 4)


def _check_model(model) -> None:
    if not isinstance(model, ResNetFCN):
        raise ValueError("pipeline parallelism supports ResNetFCN backbones")
    if model.output_stride != 8:
        raise ValueError("pipeline parallelism: only output_stride=8")
    if model.dilated_s2b or model.quant_int8:
        raise ValueError(
            "pipeline parallelism composes with neither dilated_s2b nor the "
            "int8 serving path")


def _segment_names(model) -> list[list[str]]:
    """Top-level variable names owned by each of the 4 base segments."""
    segs = [["stem_conv", "stem_bn"]
            + [f"stage1_block{b}" for b in range(model.stage_sizes[0])]]
    for stage in (1, 2):
        segs.append([f"stage{stage + 1}_block{b}"
                     for b in range(model.stage_sizes[stage])])
    segs.append([f"stage4_block{b}" for b in range(model.stage_sizes[3])]
                + ["head"])
    return segs


def _segment_fns(model, image_hw):
    """Per-segment pure functions ``fn(params_sub, stats_sub, x) -> y``.

    Each reconstructs its slice of ``ResNetFCN.__call__`` (same submodule
    classes, same op order) by applying the blocks standalone on the
    corresponding subtrees — BN in running-average mode (see module
    docstring). Exactness vs ``model.apply(..., train=False)`` is asserted
    in tests/test_pipeline_parallel.py.
    """
    _check_model(model)
    H, W = image_hw
    dt = model.dtype
    block_cls = BottleneckBlock if model.bottleneck else BasicBlock

    def block(name, stage, first, p, bs, x):
        blk = block_cls(
            features=_FEATURES[stage],
            stride=_STRIDES[stage] if first else 1,
            dilation=_DILATIONS[stage], dtype=dt)
        return blk.apply(
            {"params": p[name], "batch_stats": bs[name]}, x, False)

    def seg0(p, bs, x):
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=dt).apply(
                        {"params": p["stem_conv"]}, x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         dtype=dt).apply(
            {"params": p["stem_bn"], "batch_stats": bs["stem_bn"]}, x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for b in range(model.stage_sizes[0]):
            x = block(f"stage1_block{b}", 0, b == 0, p, bs, x)
        return x

    def make_mid(stage):
        def seg(p, bs, x):
            for b in range(model.stage_sizes[stage]):
                x = block(f"stage{stage + 1}_block{b}", stage, b == 0, p, bs, x)
            return x
        return seg

    def seg3(p, bs, x):
        for b in range(model.stage_sizes[3]):
            x = block(f"stage4_block{b}", 3, b == 0, p, bs, x)
        x = nn.Conv(model.num_classes, (1, 1), dtype=dt).apply(
            {"params": p["head"]}, x)
        return _resize_bilinear(x, H, W)

    return [seg0, make_mid(1), make_mid(2), seg3]


def _group(items: list, n_groups: int) -> list[list]:
    """Split the 4 base segments into ``n_groups`` contiguous groups."""
    if len(items) % n_groups:
        raise ValueError(
            f"pipe axis size {n_groups} must divide the {len(items)} base "
            "segments (use 1, 2, or 4)")
    k = len(items) // n_groups
    return [items[i * k:(i + 1) * k] for i in range(n_groups)]


# ---------------------------------------------------------------------------
# Flat packing: heterogeneous pytrees -> uniform stacked buffers
# ---------------------------------------------------------------------------


def _flatten_tree(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes = tuple(tuple(l.shape) for l in leaves)
    if leaves:
        vec = jnp.concatenate(
            [jnp.ravel(l).astype(jnp.float32) for l in leaves])
    else:
        vec = jnp.zeros((0,), jnp.float32)
    return vec, (treedef, shapes)


def _unflatten_tree(vec, meta):
    treedef, shapes = meta
    leaves, off = [], 0
    for shp in shapes:
        n = int(np.prod(shp, dtype=np.int64)) if shp else 1
        leaves.append(lax.slice(vec, (off,), (off + n,)).reshape(shp))
        off += n
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _stack_padded(vecs):
    sizes = [int(v.shape[0]) for v in vecs]
    pmax = max(max(sizes), 1)
    rows = [jnp.pad(v, (0, pmax - s)) for v, s in zip(vecs, sizes)]
    return jnp.stack(rows), sizes


class PipelinePack(flax.struct.PyTreeNode):
    """Stage-stacked flat parameters (Adam-updated) and batch stats
    (frozen), each ``[S, max_len]`` fp32, sharded ``P(pipe, None)``."""

    pstack: Any
    bstack: Any


class _PipelineMeta:
    """Static unpack metadata (host-side; not a pytree)."""

    def __init__(self, groups, pmetas, psizes, bmetas, bsizes):
        self.groups = groups      # list of top-level variable name lists
        self.pmetas = pmetas
        self.psizes = psizes
        self.bmetas = bmetas
        self.bsizes = bsizes


def pack_pipeline_variables(model, variables, n_stages: int):
    """Pack ``variables`` into a :class:`PipelinePack` of ``n_stages`` rows.

    :return: ``(pack, meta)`` — ``meta`` is needed by
        :func:`unpack_pipeline_variables` and by the forward builders.
    """
    groups = [[n for seg in g for n in seg]
              for g in _group(_segment_names(model), n_stages)]
    params = variables["params"]
    stats = variables["batch_stats"]
    pvecs, pmetas, bvecs, bmetas = [], [], [], []
    for names in groups:
        pv, pm = _flatten_tree({n: params[n] for n in names})
        bv, bm = _flatten_tree({n: stats[n] for n in names if n in stats})
        pvecs.append(pv)
        pmetas.append(pm)
        bvecs.append(bv)
        bmetas.append(bm)
    pstack, psizes = _stack_padded(pvecs)
    bstack, bsizes = _stack_padded(bvecs)
    pack = PipelinePack(pstack=pstack, bstack=bstack)
    return pack, _PipelineMeta(groups, pmetas, psizes, bmetas, bsizes)


def unpack_pipeline_variables(pack: PipelinePack, meta: _PipelineMeta):
    """Reassemble the standard Flax ``variables`` dict from a pack (for
    checkpointing with the normal model-folder contract)."""
    params, stats = {}, {}
    pstack = np.asarray(jax.device_get(pack.pstack))
    bstack = np.asarray(jax.device_get(pack.bstack))
    for i in range(len(meta.groups)):
        ptree = _unflatten_tree(jnp.asarray(pstack[i, :meta.psizes[i]]),
                                meta.pmetas[i])
        params.update(jax.device_get(ptree))
        btree = _unflatten_tree(jnp.asarray(bstack[i, :meta.bsizes[i]]),
                                meta.bmetas[i])
        stats.update(jax.device_get(btree))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# The pipelined forward (shard_map body)
# ---------------------------------------------------------------------------


def _build_pp_forward(model, mesh: Mesh, image_hw, microbatch: int,
                      meta: _PipelineMeta, pipe_axis: str,
                      data_axis: Optional[str]):
    """The differentiable pipelined forward:
    ``fwd(pack, imgs [N, H, W, 3]) -> [N, H, W, D]``.

    ``N`` (per data shard) must be a multiple of ``microbatch``. Output is
    psum-broadcast over the pipe axis (every chip returns the full
    descriptor batch — the last stage's copies cost one small collective
    and keep the out_specs simple).
    """
    H, W = image_hw
    S = mesh.shape[pipe_axis]
    mb = microbatch
    dt = model.dtype
    base_fns = _segment_fns(model, image_hw)
    group_fns = []
    for seg_group in _group(list(range(4)), S):
        def gfn(p, bs, x, _members=tuple(seg_group)):
            for j in _members:
                x = base_fns[j](p, bs, x)
            return x
        group_fns.append(gfn)

    # boundary shapes via abstract evaluation (exact, no hand-derivation)
    out_shapes = []
    x_sds = jax.ShapeDtypeStruct((mb, H, W, 3), jnp.float32)
    for i in range(S):
        p_sds = jax.eval_shape(
            lambda v, m=meta.pmetas[i], s=meta.psizes[i]: _unflatten_tree(
                v, m), jax.ShapeDtypeStruct((meta.psizes[i],), jnp.float32))
        b_sds = jax.eval_shape(
            lambda v, m=meta.bmetas[i]: _unflatten_tree(v, m),
            jax.ShapeDtypeStruct((meta.bsizes[i],), jnp.float32))
        x_sds = jax.eval_shape(group_fns[i], p_sds, b_sds, x_sds)
        out_shapes.append(tuple(x_sds.shape))
    out_sizes = [int(np.prod(s[1:], dtype=np.int64)) for s in out_shapes]
    amax = max(out_sizes)
    D = out_shapes[-1][-1]

    perm = [(i, i + 1) for i in range(S - 1)]
    smap = get_shard_map()

    def body(pstack_blk, bstack_blk, imgs_blk):
        # pstack_blk [1, Pmax] (this chip's stage row); imgs_blk
        # [N_local, H, W, 3] (replicated over pipe, sharded over data)
        n_local = imgs_blk.shape[0]
        M = n_local // mb
        imgs_mb = imgs_blk.reshape(M, mb, H, W, 3)
        s = lax.axis_index(pipe_axis)
        p_row = pstack_blk[0]
        b_row = bstack_blk[0]

        def make_branch(i):
            def br(buf, img):
                pv = _unflatten_tree(
                    lax.slice(p_row, (0,), (meta.psizes[i],)), meta.pmetas[i])
                bv = _unflatten_tree(
                    lax.slice(b_row, (0,), (meta.bsizes[i],)), meta.bmetas[i])
                if i == 0:
                    x = img
                else:
                    x = lax.slice(buf, (0, 0), (mb, out_sizes[i - 1]))
                    x = x.reshape(out_shapes[i - 1]).astype(dt)
                y = group_fns[i](pv, bv, x)
                flat = y.reshape(mb, -1).astype(dt)
                out = jnp.zeros((mb, amax), dt)
                return lax.dynamic_update_slice(out, flat, (0, 0))
            return br

        branches = [make_branch(i) for i in range(S)]

        def tick(buf, t):
            img = imgs_mb[jnp.clip(t, 0, M - 1)]
            out = lax.switch(s, branches, buf, img)
            nxt = lax.ppermute(out, pipe_axis, perm) if S > 1 else out
            return nxt, out

        _, ys = lax.scan(tick, jnp.zeros((mb, amax), dt),
                         jnp.arange(M + S - 1))
        outs = ys[S - 1:]  # the last stage's results, ticks S-1 .. S-2+M
        outs = lax.slice(outs, (0, 0, 0), (M, mb, out_sizes[-1]))
        outs = outs.reshape(M * mb, H, W, D)
        on_last = (s == S - 1)
        outs = jnp.where(on_last, outs, jnp.zeros_like(outs))
        return lax.psum(outs, pipe_axis)

    img_spec = P(data_axis) if data_axis else P()
    mapped = smap(
        body, mesh=mesh,
        in_specs=(P(pipe_axis, None), P(pipe_axis, None), img_spec),
        out_specs=img_spec,
    )

    def fwd(pack: PipelinePack, imgs):
        return mapped(pack.pstack, pack.bstack, imgs)

    return fwd


def pack_shardings(mesh: Mesh, pipe_axis: str = "pipe") -> PipelinePack:
    """NamedShardings for a :class:`PipelinePack` (stage rows over pipe)."""
    row = NamedSharding(mesh, P(pipe_axis, None))
    return PipelinePack(pstack=row, bstack=row)


def make_pp_inference(model, mesh: Mesh, image_hw, microbatch: int = 1,
                      pipe_axis: str = "pipe",
                      data_axis: Optional[str] = None,
                      normalize: bool = False):
    """Pipelined descriptor inference.

    :return: ``build(variables) -> (fwd, pack)`` — pack once, then
        ``fwd(pack, imgs [N, H, W, 3]) -> [N, H, W, D]`` with ``N`` a
        multiple of ``microbatch`` (x data-axis size when given: images are
        additionally batch-sharded over ``data``).
    """
    repl = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(data_axis)) if data_axis else repl

    def build(variables):
        pack, meta = pack_pipeline_variables(
            model, variables, mesh.shape[pipe_axis])
        pack = jax.device_put(pack, pack_shardings(mesh, pipe_axis))
        fwd = _build_pp_forward(model, mesh, image_hw, microbatch, meta,
                                pipe_axis, data_axis)

        def run(pack, imgs):
            out = fwd(pack, imgs)
            if normalize:
                out = out / jnp.maximum(
                    jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
            return out

        jitted = jax.jit(
            run,
            in_shardings=(pack_shardings(mesh, pipe_axis), img_sh),
            out_shardings=img_sh)
        return jitted, pack

    return build


# ---------------------------------------------------------------------------
# Pipelined train step (frozen-BN / fine-tuning semantics)
# ---------------------------------------------------------------------------


class PPTrainState(flax.struct.PyTreeNode):
    step: Any
    pack: PipelinePack
    opt_state: Any


def make_pp_train_step(model, tx, loss_cfg, assembler_cfg, image_width: int,
                       mesh: Mesh, state, image_hw, microbatch: int = 1,
                       pipe_axis: str = "pipe", data_axis: str = "data"):
    """DP x PP train step: pairs sharded over ``data``, the network
    pipelined over ``pipe`` (GPipe microbatch schedule; JAX's autodiff of
    the schedule is the reverse pipeline). BN uses running statistics (the
    GPipe BN caveat — see module docstring); agreement with a single-device
    frozen-BN step is asserted in tests/test_pipeline_parallel.py.

    :param state: a regular ``TrainState`` (its params/batch_stats are
        packed; its opt_state is rebuilt on the packed representation).
    :return: ``(step, pp_state, meta)`` — run ``pp_state, metrics =
        step(pp_state, batch, key)``; recover normal variables with
        :func:`unpack_pipeline_variables` ``(pp_state.pack, meta)``. The
        state input is donated: continue from the returned state.
    """
    from pdc_tpu.training.train import pick_assembly

    H, W = image_hw
    S = mesh.shape[pipe_axis]
    pack, meta = pack_pipeline_variables(
        model, {"params": state.params, "batch_stats": state.batch_stats}, S)
    fwd = _build_pp_forward(model, mesh, image_hw, microbatch, meta,
                            pipe_axis, data_axis)
    assemble_batch, compose = pick_assembly(assembler_cfg)

    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(pipe_axis, None))
    st_sh = PPTrainState(
        step=repl,
        pack=pack_shardings(mesh, pipe_axis),
        opt_state=jax.tree.map(
            lambda l: row if getattr(l, "ndim", 0) == 2 else repl,
            jax.eval_shape(tx.init, pack.pstack)),
    )
    pp_state = PPTrainState(step=state.step, pack=pack,
                            opt_state=tx.init(pack.pstack))
    pp_state = jax.device_put(pp_state, st_sh)

    def loss_fn(pstack, bstack, img_a, img_b, indices):
        B = img_a.shape[0]
        imgs = jnp.concatenate([img_a, img_b], axis=0)
        out = fwd(PipelinePack(pstack=pstack, bstack=bstack), imgs)
        D = out.shape[-1]
        pred = out.reshape(2 * B, H * W, D)
        pred_a, pred_b = pred[:B], pred[B:]
        terms = jax.vmap(
            lambda pa, pb, s: compose(pa, pb, s, loss_cfg, image_width)
        )(pred_a, pred_b, indices)
        non_empty = (indices.match_type >= 0).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(non_empty), 1.0)
        loss = jnp.sum(terms.loss * non_empty) / denom
        def avg(x):
            return jnp.sum(x * non_empty) / denom

        # full metric-key set so the trainer's logging/TB path is layout-
        # agnostic (training/train.py _materialize_metrics)
        metrics = {
            "loss": loss,
            "match_loss": avg(terms.match_loss),
            "masked_non_match_loss": avg(terms.masked_non_match_loss),
            "background_non_match_loss": avg(terms.background_non_match_loss),
            "blind_non_match_loss": avg(terms.blind_non_match_loss),
            "num_valid_matches": jnp.sum(indices.matches_valid) / denom,
        }
        return loss, metrics

    def step(st: PPTrainState, batch, key):
        img_a, img_b, indices = assemble_batch(key, batch, assembler_cfg)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.pack.pstack, st.pack.bstack, img_a, img_b, indices)
        updates, new_opt = tx.update(grads, st.opt_state, st.pack.pstack)
        new_p = optax.apply_updates(st.pack.pstack, updates)
        return PPTrainState(
            step=st.step + 1,
            pack=PipelinePack(pstack=new_p, bstack=st.pack.bstack),
            opt_state=new_opt,
        ), metrics

    data = NamedSharding(mesh, P(data_axis))
    batch_shardings = {
        k: data for k in (
            "match_type", "rgb_a", "depth_a", "mask_a", "pose_a",
            "rgb_b", "depth_b", "mask_b", "pose_b", "K",
        )
    }
    jitted = jax.jit(
        step,
        in_shardings=(st_sh, batch_shardings, repl),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,),
    )
    return jitted, pp_state, meta


def make_frozen_bn_train_step(model, tx, loss_cfg, assembler_cfg,
                              image_width: int, image_hw):
    """Single-device oracle for the pipelined step: the IDENTICAL math
    (frozen-BN forward, same assembler keys, same loss composition, same
    optax update) with no mesh and no packing. The loss/metrics composition
    is deliberately written out rather than reusing
    ``training.train.build_loss_fn`` — an oracle that shares machinery with
    the step it certifies cannot catch bugs in that machinery. The pipelined trainer's loss
    trajectory must match this step's trajectory to float-reassociation
    tolerance — this is what `tests/test_trainer_model_parallel.py` and
    ``__graft_entry__.dryrun_multichip`` check #10 assert, replacing the
    earlier finiteness-only check. (Frozen BN at *init* normalizes with
    mean 0 / var 1 running stats, so early-step losses can legitimately
    spike by 10-100x before the optimizer adapts — the oracle reproduces
    that trajectory exactly, distinguishing frozen-BN semantics from a
    pipeline-schedule bug.)

    :return: jitted ``step(state, batch, key) -> (state, metrics)`` over a
        regular ``TrainState`` (batch_stats left untouched, as in the
        pipelined step).
    """
    from pdc_tpu.training.train import pick_assembly

    H, W = image_hw
    assemble_batch, compose = pick_assembly(assembler_cfg)

    def loss_fn(params, batch_stats, img_a, img_b, indices):
        B = img_a.shape[0]
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.concatenate([img_a, img_b], axis=0), train=False)
        D = out.shape[-1]
        pred = out.reshape(2 * B, H * W, D)
        terms = jax.vmap(
            lambda pa, pb, s: compose(pa, pb, s, loss_cfg, image_width)
        )(pred[:B], pred[B:], indices)
        non_empty = (indices.match_type >= 0).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(non_empty), 1.0)
        loss = jnp.sum(terms.loss * non_empty) / denom

        def avg(x):
            return jnp.sum(x * non_empty) / denom

        metrics = {
            "loss": loss,
            "match_loss": avg(terms.match_loss),
            "masked_non_match_loss": avg(terms.masked_non_match_loss),
            "background_non_match_loss": avg(terms.background_non_match_loss),
            "blind_non_match_loss": avg(terms.blind_non_match_loss),
            "num_valid_matches": jnp.sum(indices.matches_valid) / denom,
        }
        return loss, metrics

    def step(st, batch, key):
        img_a, img_b, indices = assemble_batch(key, batch, assembler_cfg)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, st.batch_stats, img_a, img_b, indices)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        return st.replace(
            step=st.step + 1,
            params=optax.apply_updates(st.params, updates),
            opt_state=new_opt,
        ), metrics

    return jax.jit(step, donate_argnums=(0,))
