"""Device-resident dataset cache.

The host->device link is the train-step bottleneck once compute is fused
(each pair ships ~7 MB of rgb/depth/mask). A processed pdc scene is ~115 MB
(SURVEY.md §6) while TPU HBM is 16+ GB — so the TPU-native design uploads
the frame stacks ONCE and sends only *frame indices* per step; the batch's
image arrays are then an HBM gather inside the jitted step. This removes
per-step host traffic entirely for datasets that fit the cache budget
(the tutorial/benchmark configs easily do).

Usage:
    cache = DeviceCache.from_dataset(dataset)
    idx = cache.sample_index_batch(B)        # tiny host arrays
    batch = cache.gather(idx)                 # device dict, same schema as
                                              # SpartanDataset.make_host_batch
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DeviceCache:
    rgb: jnp.ndarray     # [F, H, W, 3] uint8, all scenes concatenated
    depth: jnp.ndarray   # [F, H, W] uint16
    mask: jnp.ndarray    # [F, H, W] uint8
    poses: np.ndarray    # [F, 4, 4] float32 (host; tiny)
    Ks: np.ndarray       # [F, 3, 3] float32 (host; tiny)
    scene_offsets: Dict[str, int]
    scene_lengths: Dict[str, int]
    dataset: object
    # valid-first pixel permutation per frame: pixel_perm[f, :mask_count[f]]
    # are frame f's mask pixels (flat indices), the rest its background.
    # Makes on-device masked sampling a single randint+gather instead of an
    # inverse-CDF binary search (pdc_tpu.ops.sampling.sample_flat_from_perm).
    pixel_perm: jnp.ndarray = None   # [F, H*W] int32
    mask_count: jnp.ndarray = None   # [F] int32

    @staticmethod
    def from_dataset(dataset, max_bytes: int = 8 << 30,
                     sharding=None,
                     precompute_sample_perm: bool = True) -> "DeviceCache":
        """Upload every scene of a SpartanDataset. Raises if over budget.

        :param sharding: optional jax sharding for the stacks (replicate by
            default; pass a pixel/batch sharding for very large caches)
        :param precompute_sample_perm: build the per-frame valid-first pixel
            permutation (adds 4*H*W bytes/frame of HBM; ~2x faster train
            step at 640x480)
        """
        rgbs, depths, masks, poses, Ks = [], [], [], [], []
        offsets, lengths = {}, {}
        off = 0
        total = 0
        for name in sorted(dataset.scenes.keys()):
            s = dataset.scenes[name]
            offsets[name] = off
            lengths[name] = s.num_frames
            off += s.num_frames
            total += s.rgb.nbytes + s.depth.nbytes + s.mask.nbytes
            if total > max_bytes:
                raise MemoryError(
                    f"dataset exceeds device-cache budget ({total} > {max_bytes} B); "
                    "stream from host instead"
                )
            rgbs.append(s.rgb)
            depths.append(s.depth)
            masks.append(s.mask)
            poses.append(s.poses.astype(np.float32))
            Ks.append(np.broadcast_to(s.K.astype(np.float32), (s.num_frames, 3, 3)))

        put = (lambda x: jax.device_put(x, sharding)) if sharding else jax.device_put
        mask_stack = put(np.concatenate(masks))
        perm, count = (None, None)
        if precompute_sample_perm:
            perm, count = build_pixel_perms(mask_stack)
        return DeviceCache(
            rgb=put(np.concatenate(rgbs)),
            depth=put(np.concatenate(depths)),
            mask=mask_stack,
            poses=np.concatenate(poses),
            Ks=np.concatenate(Ks),
            scene_offsets=offsets,
            scene_lengths=lengths,
            dataset=dataset,
            pixel_perm=perm,
            mask_count=count,
        )

    @property
    def nbytes(self):
        return self.rgb.nbytes + self.depth.nbytes + self.mask.nbytes

    # -- sampling ------------------------------------------------------------

    def sample_index_batch(self, batch_size: int) -> dict:
        """Host-side pair sampling -> global frame indices + poses/Ks.

        Reuses the dataset's full sampling logic (type mix, pose-difference
        rejection) but returns only scalars per pair.
        """
        def global_frames(pair):
            meta = pair.metadata
            if pair.match_type == -1:
                scene = meta.get("scene_name") or sorted(self.scene_offsets)[0]
                return self.scene_offsets[scene], self.scene_offsets[scene]
            if "scene_name" in meta:
                base = self.scene_offsets[meta["scene_name"]]
                return base + meta["image_a_idx"], base + meta["image_b_idx"]
            return (
                self.scene_offsets[meta["scene_name_a"]] + meta["image_a_idx"],
                self.scene_offsets[meta["scene_name_b"]] + meta["image_b_idx"],
            )

        pairs = [self.dataset.sample_pair() for _ in range(batch_size)]
        frames = [global_frames(p) for p in pairs]
        out = {
            "frame_a": np.asarray([f[0] for f in frames], np.int32),
            "frame_b": np.asarray([f[1] for f in frames], np.int32),
            "match_type": np.asarray([p.match_type for p in pairs], np.int32),
            "pose_a": np.stack([p.pose_a.astype(np.float32) for p in pairs]),
            "pose_b": np.stack([p.pose_b.astype(np.float32) for p in pairs]),
            "K": np.stack([p.K.astype(np.float32) for p in pairs]),
        }
        from pdc_tpu.losses.composer import MATCH_TYPE_SYNTHETIC_MULTI_OBJECT

        if MATCH_TYPE_SYNTHETIC_MULTI_OBJECT in getattr(
            self.dataset, "_data_type_probabilities", {}
        ):
            seconds = [p.second if p.second is not None else p for p in pairs]
            frames2 = [global_frames(s) for s in seconds]
            out.update({
                "frame_a_2": np.asarray([f[0] for f in frames2], np.int32),
                "frame_b_2": np.asarray([f[1] for f in frames2], np.int32),
                "pose_a_2": np.stack([s.pose_a.astype(np.float32) for s in seconds]),
                "pose_b_2": np.stack([s.pose_b.astype(np.float32) for s in seconds]),
                "K_2": np.stack([s.K.astype(np.float32) for s in seconds]),
            })
        return out

    def gather(self, index_batch: dict) -> dict:
        """Index batch -> full batch dict (device HBM gathers)."""
        out = {"match_type": jnp.asarray(index_batch["match_type"])}
        for suffix in ("", "_2"):
            if "frame_a" + suffix not in index_batch:
                continue
            fa = jnp.asarray(index_batch["frame_a" + suffix])
            fb = jnp.asarray(index_batch["frame_b" + suffix])
            out.update({
                "rgb_a" + suffix: jnp.take(self.rgb, fa, axis=0),
                "depth_a" + suffix: jnp.take(self.depth, fa, axis=0),
                "mask_a" + suffix: jnp.take(self.mask, fa, axis=0),
                "pose_a" + suffix: jnp.asarray(index_batch["pose_a" + suffix]),
                "rgb_b" + suffix: jnp.take(self.rgb, fb, axis=0),
                "depth_b" + suffix: jnp.take(self.depth, fb, axis=0),
                "mask_b" + suffix: jnp.take(self.mask, fb, axis=0),
                "pose_b" + suffix: jnp.asarray(index_batch["pose_b" + suffix]),
                "K" + suffix: jnp.asarray(index_batch["K" + suffix]),
            })
            if suffix == "" and self.pixel_perm is not None:
                out.update({
                    "perm_a": jnp.take(self.pixel_perm, fa, axis=0),
                    "count_a": jnp.take(self.mask_count, fa, axis=0),
                    "perm_b": jnp.take(self.pixel_perm, fb, axis=0),
                    "count_b": jnp.take(self.mask_count, fb, axis=0),
                })
        return out


def build_pixel_perms(mask_stack, chunk: int = 64):
    """Valid-first pixel permutations for a [F, H, W] mask stack (device-side,
    chunked so the argsort working set stays bounded).

    :return: (pixel_perm [F, H*W] int32, mask_count [F] int32)
    """
    from pdc_tpu.ops.sampling import build_pixel_perm

    F = mask_stack.shape[0]
    build = jax.jit(jax.vmap(build_pixel_perm))
    perms, counts = [], []
    for start in range(0, F, chunk):
        p, c = build(mask_stack[start:start + chunk])
        perms.append(p)
        counts.append(c)
    return jnp.concatenate(perms), jnp.concatenate(counts)


def partition_scenes(dataset, num_shards: int, by_object: bool = False):
    """Greedy balanced partition of whole scenes across shards (largest
    first to the least-loaded shard). Whole scenes per shard keep
    within-scene pair sampling local to a chip; ``by_object`` keeps ALL
    scenes of an object together so across-scene (same-object) pairs are
    chip-local too."""
    if by_object:
        objects = {}
        for name, s in dataset.scenes.items():
            objects.setdefault(s.object_id or name, []).append(name)
        units = [(sorted(names),
                  sum(dataset.scenes[n].num_frames for n in names))
                 for names in objects.values()]
    else:
        units = [([name], dataset.scenes[name].num_frames)
                 for name in dataset.scenes]
    units.sort(key=lambda u: -u[1])
    shards = [[] for _ in range(num_shards)]
    loads = [0] * num_shards
    for names, frames in units:
        i = int(np.argmin(loads))
        shards[i].extend(names)
        loads[i] += frames
    for i, names in enumerate(shards):
        if not names:
            kind = "objects" if by_object else "scenes"
            raise ValueError(
                f"shard {i} received no scenes — dataset has too few {kind} "
                f"for {num_shards} shards")
    return shards


@dataclasses.dataclass
class ShardedDeviceCache:
    """Frame stacks sharded over a mesh's data axis: chip c holds ONLY rows
    [c*frames_per_shard, (c+1)*frames_per_shard) — the per-chip HBM cost is
    total_bytes / n_chips, so pod-scale training fits datasets far larger
    than one chip's HBM (the reference's full dataset is ~100 GB, SURVEY §6).

    Each chip samples training pairs from its own scene subset (per-host
    data sharding); gradients still mix globally via pmean. Layout per chip,
    inside shard_map: stacks [frames_per_shard, ...], scene tables [1, Smax]
    (offsets/lengths LOCAL to the chip's block, zero-padded), num_scenes
    [1, 1].
    """

    rgb: jnp.ndarray              # [n*Fmax, H, W, 3] uint8, P(data) on axis 0
    depth: jnp.ndarray            # [n*Fmax, H, W] uint16
    mask: jnp.ndarray             # [n*Fmax, H, W] uint8
    poses: jnp.ndarray            # [n*Fmax, 4, 4] float32 (same sharding)
    Ks: jnp.ndarray               # [n*Fmax, 3, 3] float32
    pixel_perm: jnp.ndarray       # [n*Fmax, H*W] int32 (same sharding)
    mask_count: jnp.ndarray       # [n*Fmax] int32
    scene_offsets: jnp.ndarray    # [n, Smax] int32 (local offsets)
    scene_lengths: jnp.ndarray    # [n, Smax] int32 (0 = padding)
    num_scenes: jnp.ndarray       # [n, 1] int32
    # per-shard object tables (type-mixed sampling; local scene slots)
    scenes_by_object: jnp.ndarray   # [n, Omax, Mmax] int32, -1 padded
    scenes_per_object: jnp.ndarray  # [n, Omax] int32
    num_objects: jnp.ndarray        # [n, 1] int32
    frames_per_shard: int
    assignment: dict              # scene name -> shard index
    mesh: object
    data_axis: str
    dataset: object

    @staticmethod
    def from_dataset(dataset, mesh, data_axis: str = "data",
                     max_bytes_per_device: int = 8 << 30,
                     by_object: bool = False) -> "ShardedDeviceCache":
        """:param by_object: keep all scenes of an object on one chip, so the
        across-scene/different-object sample types stay chip-local (needed
        for type-mixed sharded training; different-object additionally needs
        >= 2 objects per shard)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = mesh.shape[data_axis]
        shards = partition_scenes(dataset, n, by_object=by_object)
        assignment = {name: i for i, names in enumerate(shards) for name in names}

        fmax = max(sum(dataset.scenes[nm].num_frames for nm in names)
                   for names in shards)
        smax = max(len(names) for names in shards)

        sample = next(iter(dataset.scenes.values()))
        H, W = sample.rgb.shape[1:3]
        rgb = np.zeros((n * fmax, H, W, 3), np.uint8)
        depth = np.zeros((n * fmax, H, W), sample.depth.dtype)
        mask = np.zeros((n * fmax, H, W), np.uint8)
        poses = np.tile(np.eye(4, dtype=np.float32), (n * fmax, 1, 1))
        Ks = np.tile(np.eye(3, dtype=np.float32), (n * fmax, 1, 1))
        offsets = np.zeros((n, smax), np.int32)
        lengths = np.zeros((n, smax), np.int32)
        nums = np.zeros((n, 1), np.int32)

        # per-shard object tables
        shard_objects = []
        for names in shards:
            objs = {}
            for j, name in enumerate(sorted(names)):
                oid = dataset.scenes[name].object_id or name
                objs.setdefault(oid, []).append(j)
            shard_objects.append(objs)
        omax = max(len(o) for o in shard_objects)
        mmax = max(max(len(v) for v in o.values()) for o in shard_objects)
        by_obj = np.full((n, omax, mmax), -1, np.int32)
        per_obj = np.zeros((n, omax), np.int32)
        num_obj = np.zeros((n, 1), np.int32)
        for c, objs in enumerate(shard_objects):
            for oi, oid in enumerate(sorted(objs)):
                slots = objs[oid]
                by_obj[c, oi, :len(slots)] = slots
                per_obj[c, oi] = len(slots)
            num_obj[c, 0] = len(objs)

        for c, names in enumerate(shards):
            off = 0
            per_device = 0
            for j, name in enumerate(sorted(names)):
                s = dataset.scenes[name]
                f = s.num_frames
                row = c * fmax + off
                rgb[row:row + f] = s.rgb
                depth[row:row + f] = s.depth
                mask[row:row + f] = s.mask
                poses[row:row + f] = s.poses.astype(np.float32)
                Ks[row:row + f] = np.broadcast_to(
                    s.K.astype(np.float32), (f, 3, 3))
                offsets[c, j] = off
                lengths[c, j] = f
                off += f
                per_device += s.rgb.nbytes + s.depth.nbytes + s.mask.nbytes
            nums[c, 0] = len(names)
            if per_device > max_bytes_per_device:
                raise MemoryError(
                    f"shard {c} exceeds per-device budget "
                    f"({per_device} > {max_bytes_per_device} B)")

        frames_sh = NamedSharding(mesh, P(data_axis))
        tables_sh = NamedSharding(mesh, P(data_axis))
        put_f = lambda x: jax.device_put(x, frames_sh)  # noqa: E731
        put_t = lambda x: jax.device_put(x, tables_sh)  # noqa: E731
        mask_dev = put_f(mask)
        perm, count = build_pixel_perms(mask_dev)
        return ShardedDeviceCache(
            rgb=put_f(rgb), depth=put_f(depth), mask=mask_dev,
            poses=put_f(poses), Ks=put_f(Ks),
            pixel_perm=put_f(perm), mask_count=put_f(count),
            scene_offsets=put_t(offsets), scene_lengths=put_t(lengths),
            num_scenes=put_t(nums),
            scenes_by_object=put_t(by_obj), scenes_per_object=put_t(per_obj),
            num_objects=put_t(num_obj), frames_per_shard=fmax,
            assignment=assignment, mesh=mesh, data_axis=data_axis,
            dataset=dataset,
        )

    @property
    def nbytes_per_device(self):
        return (self.rgb.nbytes + self.depth.nbytes + self.mask.nbytes) // max(
            self.mesh.shape[self.data_axis], 1)


def make_cached_train_step(model, tx, loss_cfg, assembler_cfg, image_width: int,
                           cache: DeviceCache):
    """Train step taking (state, index_batch, key) with the frame gather
    fused into the jitted program — zero image bytes cross the host link per
    step."""
    import optax

    from pdc_tpu.training.train import TrainState, build_loss_fn, pick_assembly

    assemble_batch, compose_loss = pick_assembly(assembler_cfg)
    loss_fn = build_loss_fn(model, loss_cfg, image_width, compose_loss)

    def step(state: TrainState, rgb, depth, mask, index_batch, key):
        batch = {"match_type": index_batch["match_type"]}
        for sfx in ("", "_2"):
            if "frame_a" + sfx not in index_batch:
                continue
            fa = index_batch["frame_a" + sfx]
            fb = index_batch["frame_b" + sfx]
            batch.update({
                "rgb_a" + sfx: jnp.take(rgb, fa, axis=0),
                "depth_a" + sfx: jnp.take(depth, fa, axis=0),
                "mask_a" + sfx: jnp.take(mask, fa, axis=0),
                "pose_a" + sfx: index_batch["pose_a" + sfx],
                "rgb_b" + sfx: jnp.take(rgb, fb, axis=0),
                "depth_b" + sfx: jnp.take(depth, fb, axis=0),
                "mask_b" + sfx: jnp.take(mask, fb, axis=0),
                "pose_b" + sfx: index_batch["pose_b" + sfx],
                "K" + sfx: index_batch["K" + sfx],
            })
            if sfx == "" and cache.pixel_perm is not None:
                batch.update({
                    "perm_a": jnp.take(cache.pixel_perm, fa, axis=0),
                    "count_a": jnp.take(cache.mask_count, fa, axis=0),
                    "perm_b": jnp.take(cache.pixel_perm, fb, axis=0),
                    "count_b": jnp.take(cache.mask_count, fb, axis=0),
                })
        img_a, img_b, indices = assemble_batch(key, batch, assembler_cfg)
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, img_a, img_b, indices)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), metrics

    jitted = jax.jit(step, donate_argnums=(0,))

    def run(state, index_batch, key):
        return jitted(state, cache.rgb, cache.depth, cache.mask,
                      index_batch, key)

    return run
