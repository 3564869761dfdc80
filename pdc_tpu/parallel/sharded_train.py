"""Data-parallel (and pixel-sharded) training over a device mesh.

TPU-native replacement for the distributed layer the reference never had
(SURVEY.md §2c): the batch of image *pairs* is sharded over the mesh's
``data`` axis, parameters/optimizer state are replicated, and GSPMD inserts
the gradient all-reduce over ICI. The correspondence/augmentation assembler
runs *inside* the sharded step, so each chip generates matches for its own
pairs — no host bottleneck, no cross-chip traffic before the gradient psum.

Use :func:`shard_host_batch` to place a host batch so each chip gets its
shard directly (one host->device transfer per chip).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pdc_tpu.data.assembler import AssemblerConfig
from pdc_tpu.losses.pixelwise_contrastive import LossConfig
from pdc_tpu.training.train import TrainState, build_loss_fn, pick_assembly


def shard_host_batch(batch: dict, mesh: Mesh):
    """Device-put a host batch dict with the leading (pair) axis sharded over
    the mesh's data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return {
        k: jax.device_put(v, sharding) for k, v in batch.items()
    }


def make_sharded_train_step(model, tx, loss_cfg: LossConfig,
                            assembler_cfg: AssemblerConfig, image_width: int,
                            mesh: Mesh, state_shardings=None,
                            data_axis: str = "data"):
    """Jitted DP train step with explicit shardings.

    Constraints: state replicated (or, with ``state_shardings`` — a pytree
    of per-leaf ``NamedSharding`` as built by
    :func:`pdc_tpu.parallel.tensor_parallel.channel_shardings` /
    ``fsdp_shardings`` — sharded and donated), batch sharded on axis 0,
    metrics replicated. XLA turns the loss/grad mean into psums over the
    data axis and derives any all-gather/reduce-scatter schedule from the
    state layout.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    st_sh = repl if state_shardings is None else state_shardings

    assemble_batch, compose_loss = pick_assembly(assembler_cfg)
    loss_fn = build_loss_fn(model, loss_cfg, image_width, compose_loss)

    def step(state: TrainState, batch, key):
        img_a, img_b, indices = assemble_batch(key, batch, assembler_cfg)
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, img_a, img_b, indices)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        ), metrics

    batch_shardings = {
        k: data for k in (
            "match_type", "rgb_a", "depth_a", "mask_a", "pose_a",
            "rgb_b", "depth_b", "mask_b", "pose_b", "K",
        )
    }
    return jax.jit(
        step,
        in_shardings=(st_sh, batch_shardings, repl),
        out_shardings=(st_sh, repl),
        # the sharded-state variants exist to SHRINK state memory — donate
        # so old and new params/moments never coexist (replicated callers
        # keep reusing their input state, so no donation there)
        donate_argnums=(0,) if state_shardings is not None else (),
    )


def make_sharded_inference(model, mesh: Mesh, normalize: bool = False):
    """Batched descriptor inference with the image batch sharded over the
    data axis — the ≥500 img/s/chip serving path scales linearly over ICI."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def fwd(variables, imgs):
        out = model.apply(variables, imgs, train=False)
        if normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        return out

    return jax.jit(fwd, in_shardings=(repl, data), out_shardings=data)


def make_pixel_sharded_best_match(mesh: Mesh, axis: str = "data"):
    """Best-match argmin with the flattened pixel axis sharded across chips.

    The 307,200-pixel descriptor image is the structural analog of a long
    sequence (SURVEY.md §5 'long-context'): shard the pixel axis, do local
    argmin per shard, then a tiny cross-shard min-reduce — a two-stage
    reduction XLA lowers to one small collective over ICI.

    :return: jitted fn(res_flat [HW, D] sharded on axis 0, queries [Q, D]
        replicated) -> (flat_idx [Q], dist [Q]) replicated
    """
    from jax import shard_map

    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def local(res_flat, queries):
        # res_flat: [HW/n, D] local shard
        rnorm = jnp.sum(jnp.square(res_flat), axis=1)
        cross = jnp.dot(res_flat, queries.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        dist2 = rnorm[:, None] - 2.0 * cross + jnp.sum(jnp.square(queries), axis=1)[None, :]
        local_idx = jnp.argmin(dist2, axis=0)  # [Q]
        local_min = jnp.take_along_axis(dist2, local_idx[None, :], axis=0)[0]
        shard_id = jax.lax.axis_index(axis)
        chunk = res_flat.shape[0]
        global_idx = shard_id * chunk + local_idx
        # cross-shard argmin: gather all (min, idx) pairs and reduce
        all_min = jax.lax.all_gather(local_min, axis)   # [n, Q]
        all_idx = jax.lax.all_gather(global_idx, axis)  # [n, Q]
        best_shard = jnp.argmin(all_min, axis=0)
        best_idx = jnp.take_along_axis(all_idx, best_shard[None, :], axis=0)[0]
        best_min = jnp.take_along_axis(all_min, best_shard[None, :], axis=0)[0]
        return best_idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(best_min, 0.0))

    # the outputs are replicated by construction (all_gather + identical
    # reduction on every shard) but the static VMA check cannot prove it
    try:
        mapped = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    except TypeError:  # older jax: the kwarg was check_rep
        mapped = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
    return jax.jit(mapped, in_shardings=(shard, repl), out_shardings=(repl, repl))
