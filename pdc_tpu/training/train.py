"""Training driver + jitted train step.

Rebuild of ``training.py:46-601`` (``DenseCorrespondenceTraining``) as a
TPU-first pipeline:

  * the whole iteration — sample assembly (correspondences, augmentation,
    non-matches), both forwards, loss, backward, Adam update — is ONE jitted
    XLA program; both images of every pair are stacked into a single [2B]
    forward for MXU utilization
  * batch > 1 is native (the reference is locked to batch 1); the contrastive
    loss is per-pair, so batching is the mean of per-pair losses
  * optimizer = Adam with additive (torch-style) weight decay and the 0.9/250
    staircase LR decay (reference training.py:133-145, 544-558)
  * checkpoint contract matches the reference model folder
    (training.py:501-541): config snapshots + step-indexed checkpoints +
    identifier + rolling loss history
  * multi-chip: ``make_sharded_train_step`` shards the pair batch over the
    mesh's data axis; XLA inserts the gradient psum over ICI
"""

from __future__ import annotations

import datetime
import logging
import os
import signal
import threading
import time
import uuid
from typing import Any, Optional

import flax
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pdc_tpu.data.assembler import AssemblerConfig, assemble_batch
from pdc_tpu.losses.composer import compose_loss
from pdc_tpu.losses.pixelwise_contrastive import LossConfig
from pdc_tpu.models.dcn import DenseCorrespondenceNetwork, build_backbone
from pdc_tpu.training.schedule import host_lr, make_lr_schedule
from pdc_tpu.utils.yaml_io import load_yaml, save_yaml

logger = logging.getLogger(__name__)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(training_config: dict):
    """torch-style Adam + additive weight decay: decay is added to the raw
    gradient *before* the Adam moments (reference optim.Adam(weight_decay=..),
    training.py:133-145), unlike decoupled AdamW."""
    t = training_config["training"]
    schedule = make_lr_schedule(training_config)
    return optax.chain(
        optax.add_decayed_weights(float(t["weight_decay"])),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(model, training_config: dict, rng, image_shape):
    H, W = image_shape
    variables = model.init(rng, jnp.zeros((1, H, W, 3), jnp.float32), train=False)
    net_cfg = training_config.get("dense_correspondence_network", {})
    if (net_cfg.get("backbone") or {}).get("pretrained"):
        # ImageNet init — the reference's operative default
        # (dense_correspondence_network.py:373-383); opt-in here because the
        # weights are a gated download (deploy/setup_tpu_vm.sh)
        from pdc_tpu.models.torch_import import maybe_load_pretrained_backbone

        variables = maybe_load_pretrained_backbone(variables, net_cfg)
    tx = make_optimizer(training_config)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    ), tx


def pick_assembly(assembler_cfg: AssemblerConfig):
    """Select (assemble_batch_fn, compose_fn) for the configured loss mode.

    Matrix/pooled (default): non-matches as shared candidate pools, hinge
    over an [Nm, P] MXU distance matrix — the TPU-fast path (the per-pair
    path's backward scatter-add of ~24M rows costs ~1.9 s/step at 640x480).
    Per-pair: reference-faithful replicated index lists (use_matrix_loss:
    false). Both support SYNTHETIC_MULTI_OBJECT compositing.
    """
    if assembler_cfg.use_matrix_loss:
        from pdc_tpu.data.assembler import assemble_batch_matrix
        from pdc_tpu.losses.matrix_loss import compose_loss_matrix

        return assemble_batch_matrix, compose_loss_matrix
    return assemble_batch, compose_loss


def build_loss_fn(model, loss_cfg: LossConfig, image_width: int, compose):
    """The shared train-mode loss: one [2B]-image forward, per-sample
    composed loss averaged over non-empty samples. Returns
    (loss, (new_batch_stats, metrics))."""

    def loss_fn(params, batch_stats, img_a, img_b, indices):
        B, H, W, _ = img_a.shape
        imgs = jnp.concatenate([img_a, img_b], axis=0)  # [2B, H, W, 3]
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, train=True, mutable=["batch_stats"],
        )
        D = out.shape[-1]
        pred = out.reshape(2 * B, H * W, D)
        pred_a, pred_b = pred[:B], pred[B:]

        terms = jax.vmap(
            lambda pa, pb, s: compose(pa, pb, s, loss_cfg, image_width)
        )(pred_a, pred_b, indices)

        # mean over non-empty samples (empty sentinel pairs contribute 0)
        non_empty = (indices.match_type >= 0).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(non_empty), 1.0)
        loss = jnp.sum(terms.loss * non_empty) / denom
        metrics = {
            "loss": loss,
            "match_loss": jnp.sum(terms.match_loss * non_empty) / denom,
            "masked_non_match_loss": jnp.sum(terms.masked_non_match_loss * non_empty) / denom,
            "background_non_match_loss": jnp.sum(terms.background_non_match_loss * non_empty) / denom,
            "blind_non_match_loss": jnp.sum(terms.blind_non_match_loss * non_empty) / denom,
            "num_valid_matches": jnp.sum(indices.matches_valid) / denom,
        }
        return loss, (mutated["batch_stats"], metrics)

    return loss_fn


def make_train_step(model, tx, loss_cfg: LossConfig, assembler_cfg: AssemblerConfig,
                    image_width: int, donate: bool = True):
    """Build the fused jitted train step.

    step(state, batch_host_arrays, key) -> (state, metrics)
    """
    _assemble, _compose = pick_assembly(assembler_cfg)
    loss_fn = build_loss_fn(model, loss_cfg, image_width, _compose)

    def step(state: TrainState, batch, key):
        img_a, img_b, indices = _assemble(key, batch, assembler_cfg)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, img_a, img_b, indices
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_loss_step(model, loss_cfg: LossConfig, assembler_cfg: AssemblerConfig,
                        image_width: int):
    """Test-loss evaluation step: eval-mode batch norm, no update
    (reference DCE.compute_loss_on_dataset, evaluation.py:2072-2152)."""
    _assemble, _compose = pick_assembly(assembler_cfg)

    @jax.jit
    def step(state: TrainState, batch, key):
        img_a, img_b, indices = _assemble(key, batch, assembler_cfg)
        B, H, W, _ = img_a.shape
        imgs = jnp.concatenate([img_a, img_b], axis=0)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, train=False,
        )
        D = out.shape[-1]
        pred = out.reshape(2 * B, H * W, D)
        terms = jax.vmap(
            lambda pa, pb, s: _compose(pa, pb, s, loss_cfg, image_width)
        )(pred[:B], pred[B:], indices)
        non_empty = (indices.match_type >= 0).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(non_empty), 1.0)
        return {
            "loss": jnp.sum(terms.loss * non_empty) / denom,
            "match_loss": jnp.sum(terms.match_loss * non_empty) / denom,
            "non_match_loss": jnp.sum(
                (terms.masked_non_match_loss + terms.background_non_match_loss) * non_empty
            ) / denom,
        }

    return step


class DenseCorrespondenceTraining:
    """End-to-end training orchestrator with the reference's folder contract."""

    def __init__(self, config: Optional[dict] = None, dataset=None,
                 dataset_test=None, batch_size: Optional[int] = None):
        if config is None:
            config = DenseCorrespondenceTraining.load_default_config()
        self._config = config
        self._dataset = dataset
        self._dataset_test = dataset_test
        self._batch_size = batch_size or int(config["training"].get("batch_size", 1))
        self._logging_dict = {"train": {"iteration": [], "loss": [],
                                        "match_loss": [],
                                        "masked_non_match_loss": [],
                                        "background_non_match_loss": [],
                                        "blind_non_match_loss": [],
                                        "learning_rate": []},
                              "test": {"iteration": [], "loss": [],
                                       "match_loss": [], "non_match_loss": []}}
        self._state = None
        self._tx = None
        self._model = None
        self._start_iteration = 0
        self._pending_metrics = []

    @property
    def dataset(self):
        return self._dataset

    @dataset.setter
    def dataset(self, value):
        self._dataset = value

    @staticmethod
    def load_default_config():
        here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        return load_yaml(os.path.join(here, "configs", "training.yaml"))

    # -- setup -------------------------------------------------------------------

    def setup_logging_dir(self):
        """Create (wiping any previous run of the same name) the model folder
        (reference training.py:459-489)."""
        t = self._config["training"]
        if "logging_dir_name" in t:
            dir_name = t["logging_dir_name"]
        else:
            stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
            d = self._config["dense_correspondence_network"]["descriptor_dimension"]
            dir_name = f"{stamp}_{d}d"
        base = t.get("logging_dir", "trained_models")
        self._logging_dir = os.path.join(base, dir_name)
        if os.path.isdir(self._logging_dir):
            import shutil

            shutil.rmtree(self._logging_dir)
        os.makedirs(self._logging_dir, exist_ok=True)
        self._setup_tensorboard()
        return self._logging_dir

    def _setup_tensorboard(self):
        """TensorBoard scalar logging (reference training.py:573-585 uses
        tensorboard_logger); disabled gracefully when tensorboard is absent
        or turned off via training.use_tensorboard: false."""
        self._tb_writer = None
        if not self._config["training"].get("use_tensorboard", True):
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_dir = os.path.join(self._logging_dir, "tensorboard")
            os.makedirs(tb_dir, exist_ok=True)
            self._tb_writer = SummaryWriter(log_dir=tb_dir)
        except Exception:  # pragma: no cover - tensorboard not installed
            self._tb_writer = None

    def _flush_tensorboard(self, upto: int):
        """Write materialized scalars (same tags as the reference's
        per-term logging, training.py:364-411)."""
        if self._tb_writer is None:
            return
        tl = self._logging_dict["train"]
        start = getattr(self, "_tb_flushed", 0)
        tags = {
            "loss": "train loss",
            "match_loss": "train match loss",
            "masked_non_match_loss": "train masked non match loss",
            "background_non_match_loss": "train background non match loss",
            "blind_non_match_loss": "train blind non match loss",
            "learning_rate": "learning rate",
        }
        for i in range(start, len(tl["iteration"])):
            it = tl["iteration"][i]
            for k, tag in tags.items():
                v = tl[k][i]
                if isinstance(v, (int, float)):
                    self._tb_writer.add_scalar(tag, v, it)
        self._tb_flushed = len(tl["iteration"])
        self._tb_writer.flush()

    @property
    def logging_dir(self):
        return self._logging_dir

    def save_configs(self):
        """Snapshot configs + unique run identifier into the model folder
        (reference training.py:525-541)."""
        save_yaml(self._config, os.path.join(self._logging_dir, "training.yaml"))
        if hasattr(self._dataset, "config_snapshot"):
            dataset_cfg = self._dataset.config_snapshot()
        else:
            dataset_cfg = getattr(self._dataset, "config", {}) or {}
        save_yaml(dataset_cfg, os.path.join(self._logging_dir, "dataset.yaml"))
        save_yaml({"id": uuid.uuid4().hex}, os.path.join(self._logging_dir, "identifier.yaml"))

    def build_network(self):
        cfg = self._config["dense_correspondence_network"]
        return build_backbone(cfg), cfg

    # -- checkpointing --------------------------------------------------------------

    def _current_variables(self):
        """The live ``{params, batch_stats}`` in the standard Flax layout —
        unpacking the stage-stacked pipeline representation when the run is
        pipelined, so the on-disk checkpoint contract is identical across
        every parallelism mode."""
        if getattr(self, "_pp_meta", None) is not None:
            from pdc_tpu.parallel.pipeline import unpack_pipeline_variables

            return unpack_pipeline_variables(self._state.pack, self._pp_meta)
        return {"params": self._state.params,
                "batch_stats": self._state.batch_stats}

    def save_network(self, iteration: int):
        """%06d.ckpt (params+batch_stats) + %06d.ckpt.opt (optimizer) +
        rolling loss.yaml (reference training.py:501-521).

        Checkpoints are written atomically (tmp file + rename) and the
        device fetch retries once — transient backend errors on a remote
        TPU runtime must not lose a long run.
        """
        tag = "%06d" % iteration
        variables = self._current_variables()

        def write_atomic(path, pytree):
            for attempt in (0, 1):
                try:
                    data = flax.serialization.to_bytes(jax.device_get(pytree))
                    tmp = path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    os.replace(tmp, path)
                    return
                except Exception:
                    if attempt == 1:
                        raise
                    logger.warning("checkpoint fetch failed; retrying once")
                    time.sleep(2.0)

        write_atomic(os.path.join(self._logging_dir, tag + ".ckpt"), variables)
        if getattr(self, "_pp_meta", None) is None:
            write_atomic(os.path.join(self._logging_dir, tag + ".ckpt.opt"),
                         self._state.opt_state)
        # (pipelined runs keep Adam moments on the stage-stacked packed
        # representation — layout-specific, so not written as .ckpt.opt;
        # resume from a PP checkpoint re-initializes the optimizer)
        save_yaml(self._logging_dict, os.path.join(self._logging_dir, tag + "_log_history.yaml"))
        current = {
            split: {k: (v[-1] if len(v) else -1) for k, v in d.items()}
            for split, d in self._logging_dict.items()
        }
        save_yaml(current, os.path.join(self._logging_dir, "loss.yaml"))

    def load_pretrained(self, model_folder: str, iteration: Optional[int] = None):
        """Resume network + optimizer state from a previous run
        (reference training.py:169-212)."""
        from pdc_tpu.models.dcn import find_latest_checkpoint

        ckpt = find_latest_checkpoint(model_folder, iteration)
        iteration = int(os.path.basename(ckpt).split(".")[0])
        self._ensure_state()
        with open(ckpt, "rb") as f:
            variables = flax.serialization.from_bytes(
                {"params": self._state.params, "batch_stats": self._state.batch_stats},
                f.read(),
            )
        opt_path = ckpt + ".opt"
        opt_state = self._state.opt_state
        if os.path.exists(opt_path):
            with open(opt_path, "rb") as f:
                opt_state = flax.serialization.from_bytes(opt_state, f.read())
        self._state = TrainState(
            step=jnp.asarray(iteration, jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=opt_state,
        )
        self._start_iteration = iteration
        return iteration

    def run_from_pretrained(self, model_folder: str, iteration: Optional[int] = None,
                            learning_rate: Optional[float] = None):
        it = self.load_pretrained(model_folder, iteration)
        if learning_rate is not None:
            self._config["training"]["learning_rate"] = learning_rate
            # rebuild the optimizer with the new base LR, keeping params
            self._tx = make_optimizer(self._config)
            self._state = self._state.replace(opt_state=self._tx.init(self._state.params))
        return self.run(loss_current_iteration=it, use_pretrained=True)

    # -- model-parallel routing ---------------------------------------------------------

    def _setup_model_parallel_step(self, loss_cfg, assembler_cfg, W):
        """Route ``training.tensor_parallel: N`` / ``training.pipeline: S``
        through the mesh step factories in :mod:`pdc_tpu.parallel`.

        Returns a jitted ``step(state, batch, key)`` with ``self._state``
        re-laid-out on the mesh (channel-sharded for TP, stage-packed for
        PP), or ``None`` when neither key is set — the caller then picks
        the replicated single-/data-parallel paths. Remaining devices go to
        a leading ``data`` axis, so ``tensor_parallel: 2`` on 8 chips is a
        4x2 DP x TP mesh. The reference has no model-parallel story at all
        (SURVEY.md §2c); these paths exist for backbones too large to
        replicate per chip.
        """
        t = self._config["training"]
        tp = int(t.get("tensor_parallel", 0) or 0)
        pp = int(t.get("pipeline", 0) or 0)
        if tp <= 1 and pp <= 1:
            return None
        if tp > 1 and pp > 1:
            raise ValueError(
                "training.tensor_parallel and training.pipeline are separate "
                "mesh layouts — set one (compose either with data_parallel; "
                "a combined TP x PP trainer mesh is not supported)")
        n = len(jax.devices())
        k = tp if tp > 1 else pp
        if n % k != 0:
            raise ValueError(
                f"{'tensor_parallel' if tp > 1 else 'pipeline'}={k} does not "
                f"divide the {n} visible devices")
        batch_size = int(t.get("batch_size", 1))
        if batch_size % (n // k) != 0:
            raise ValueError(
                f"training.batch_size={batch_size} must be a multiple of "
                f"the data axis ({n // k} = {n} devices / "
                f"{'tensor_parallel' if tp > 1 else 'pipeline'}={k}) — "
                f"each step's batch is sharded over it")
        from pdc_tpu.parallel.mesh import make_mesh

        net_cfg = self._config["dense_correspondence_network"]
        H = net_cfg["image_height"]
        if tp > 1:
            from pdc_tpu.parallel.tensor_parallel import make_tp_train_step

            mesh = make_mesh(("data", "model"), shape=(n // k, k))
            logger.info("tensor-parallel training: %dx%d DP x TP mesh",
                        n // k, k)
            step, self._state = make_tp_train_step(
                self._model, self._tx, loss_cfg, assembler_cfg, W,
                mesh, self._state)
            return step
        from pdc_tpu.parallel.pipeline import make_pp_train_step

        mesh = make_mesh(("data", "pipe"), shape=(n // k, k))
        logger.info("pipeline-parallel training: %dx%d DP x PP mesh "
                    "(GPipe, frozen BN — see parallel/pipeline.py)",
                    n // k, k)
        step, self._state, self._pp_meta = make_pp_train_step(
            self._model, self._tx, loss_cfg, assembler_cfg, W,
            mesh, self._state, (H, W),
            microbatch=int(t.get("pipeline_microbatch", 1)))
        return step

    # -- the loop ---------------------------------------------------------------------

    def _ensure_state(self):
        if self._state is not None:
            return
        model, net_cfg = self.build_network()
        self._model = model
        H, W = net_cfg["image_height"], net_cfg["image_width"]
        self._state, self._tx = create_train_state(
            model, self._config, jax.random.PRNGKey(0), (H, W)
        )

    def run(self, loss_current_iteration: int = 0, use_pretrained: bool = False,
            progress_callback=None):
        """Train. Returns the model folder path."""
        assert self._dataset is not None, "set a dataset first"
        t = self._config["training"]
        net_cfg = self._config["dense_correspondence_network"]
        H, W = net_cfg["image_height"], net_cfg["image_width"]

        # persistent XLA compilation cache (40-200 s compiles of the fused
        # 640x480 programs amortize across processes)
        from pdc_tpu.utils.compilation_cache import enable, maybe_enable_from_env

        if t.get("compilation_cache_dir"):
            enable(t["compilation_cache_dir"])
        else:
            maybe_enable_from_env()

        self.setup_logging_dir()
        self.save_configs()
        self._dataset.set_parameters_from_training_config(self._config)
        self._ensure_state()

        loss_cfg = LossConfig.from_dict(self._config["loss_function"])
        assembler_cfg = AssemblerConfig.from_training_config(self._config)

        # Model-parallel axes (training.tensor_parallel: N / training.pipeline:
        # S): route through the mesh step factories in parallel/. These paths
        # stream host batches (the device cache assumes replicated state) —
        # they exist for backbones too large to replicate per chip, where the
        # weights, not the input pipeline, are the constraint.
        self._pp_meta = None
        train_step = self._setup_model_parallel_step(loss_cfg, assembler_cfg, W)
        model_parallel_active = train_step is not None

        # Default fast path: cache the frame stacks in device HBM and send
        # only frame indices per step (zero per-step image transfer). Falls
        # back to host streaming when the dataset exceeds the budget.
        cache = None
        scanned_step = None
        steps_per_dispatch = int(t.get("steps_per_dispatch", 10))
        if train_step is None and t.get("cache_dataset_on_device", True):
            try:
                from pdc_tpu.data.device_cache import (
                    DeviceCache,
                    make_cached_train_step,
                )

                cache = DeviceCache.from_dataset(
                    self._dataset,
                    max_bytes=int(t.get("device_cache_max_bytes", 8 << 30)),
                )
                logger.info("device cache: %.0f MB", cache.nbytes / 1e6)

                # fastest path: K steps per dispatch, pair sampling on device
                # (within-scene/across-scene/different-object/synthetic-
                # multi-object mixes; MULTI_OBJECT scene lists still need the
                # host sampler). K is clamped to the largest divisor of
                # num_iterations so runs end exactly on schedule.
                type_probs = getattr(self._dataset, "_data_type_probabilities", {0: 1.0})
                scannable = set(type_probs.keys()) <= {0, 1, 2, 4}
                n_iter = int(t["num_iterations"])
                k_eff = next(
                    (k for k in range(min(steps_per_dispatch, n_iter), 0, -1)
                     if n_iter % k == 0), 1,
                )
                if k_eff > 1 and scannable and assembler_cfg.use_matrix_loss:
                    from pdc_tpu.training.scanned import make_scanned_train_step

                    # training.data_parallel: true -> DP over all local
                    # chips (per-chip batch = batch_size, so the GLOBAL
                    # batch is batch_size * n_chips); training.fsdp: true
                    # additionally ZeRO-shards params + Adam moments
                    mesh = None
                    if t.get("data_parallel", False) and len(jax.devices()) > 1:
                        from pdc_tpu.parallel.mesh import make_mesh

                        mesh = make_mesh(("data",))
                        logger.info(
                            "data-parallel scanned training over %d chips "
                            "(global batch %d)%s", mesh.shape["data"],
                            self._batch_size * mesh.shape["data"],
                            " + fsdp state sharding" if t.get("fsdp") else "")
                    scanned_step = make_scanned_train_step(
                        self._model, self._tx, loss_cfg, assembler_cfg, W,
                        cache, self._batch_size, k_eff,
                        mesh=mesh,
                        fsdp=bool(t.get("fsdp", False)) and mesh is not None,
                        type_probs=tuple(sorted(type_probs.items())),
                    )
                else:
                    train_step = make_cached_train_step(
                        self._model, self._tx, loss_cfg, assembler_cfg, W, cache
                    )
            except MemoryError as e:
                logger.warning("device cache disabled: %s", e)
                cache = None
        if cache is None and train_step is None:
            train_step = make_train_step(self._model, self._tx, loss_cfg,
                                         assembler_cfg, W)
        if (scanned_step is None and not model_parallel_active
                and (t.get("data_parallel") or t.get("fsdp"))):
            # never train single-chip while the user believes DP is on
            # (the model-parallel meshes already carry a data axis, so
            # TP/PP runs are NOT single-chip — don't warn there)
            logger.warning(
                "training.data_parallel/fsdp IGNORED: multi-chip training "
                "needs the device-cache scanned path (>1 device, matrix "
                "loss, steps_per_dispatch divisor > 1, scannable sample "
                "types) — this run is single-chip")
        elif t.get("fsdp") and not t.get("data_parallel"):
            logger.warning(
                "training.fsdp IGNORED: requires training.data_parallel")

        eval_step = None
        if t.get("compute_test_loss", False) and self._dataset_test is not None:
            self._dataset_test.set_parameters_from_training_config(self._config)
            eval_step = make_eval_loss_step(self._model, loss_cfg, assembler_cfg, W)

        max_iterations = int(t["num_iterations"]) + loss_current_iteration
        save_rate = int(t.get("save_rate", 1000))
        logging_rate = int(t.get("logging_rate", 100))
        test_rate = int(t.get("compute_test_loss_rate", 500))

        if not use_pretrained:
            self.save_network(0)

        # profiling hook (SURVEY.md §5: the reference has none; we expose
        # jax.profiler traces viewable in TensorBoard/XProf)
        profile_dir = t.get("profile_dir")
        profile_steps = int(t.get("profile_num_steps", 10))
        profiling = False

        key = jax.random.PRNGKey(int(t.get("seed", 1)))
        # background host prefetch: the sampler thread assembles batch k+1
        # while the device runs step k (replaces the reference's DataLoader
        # worker pool, training.py:96-97)
        from pdc_tpu.data.native_loader import PrefetchLoader

        prefetch = None
        if scanned_step is None:
            if cache is not None:
                prefetch = PrefetchLoader(
                    lambda: cache.sample_index_batch(self._batch_size),
                    depth=2, to_device=False,
                )
            else:
                prefetch = PrefetchLoader(
                    lambda: self._dataset.make_host_batch(self._batch_size), depth=2
                )

        # Graceful preemption (SURVEY.md §5 failure handling; the reference
        # loses up to save_rate steps on eviction). Preemptible/spot TPU VMs
        # deliver SIGTERM ahead of shutdown: flag it, finish the in-flight
        # dispatch, write a checkpoint at the step boundary, and return
        # cleanly — a restarted job resumes via run_from_pretrained. The
        # handler only sets a flag, so it is async-signal safe; installed
        # only from the main thread (signal.signal requires it) and restored
        # on exit so callers/tests keep their own handlers.
        self.preempted = False
        self._preempt_requested = False
        _old_sigterm = None
        if (bool(t.get("handle_preemption", True))
                and threading.current_thread() is threading.main_thread()):
            def _request_preempt(signum, frame):
                self._preempt_requested = True
            _old_sigterm = signal.signal(signal.SIGTERM, _request_preempt)

        metric_keys = ("loss", "match_loss", "masked_non_match_loss",
                       "background_non_match_loss", "blind_non_match_loss")
        it = loss_current_iteration
        try:
            while it < max_iterations:
                if profile_dir and it == loss_current_iteration + 1 and not profiling:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                if profiling and it >= loss_current_iteration + 1 + profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
                t0 = time.time()
                key, step_key = jax.random.split(key)
                tl = self._logging_dict["train"]
                if scanned_step is not None:
                    # K steps per dispatch, sampling on device; the [K] metric
                    # arrays are queued whole and fetched in one batch at logging
                    # boundaries (per-element fetches cost a round trip each)
                    self._state, metrics = scanned_step(self._state, step_key)
                    k_steps = int(metrics["loss"].shape[0])
                    self._pending_metrics.append((metrics, k_steps))
                    for j in range(k_steps):
                        it += 1
                        tl["iteration"].append(it)
                        tl["learning_rate"].append(host_lr(self._config, it))
                else:
                    it += 1
                    batch = prefetch.next()
                    self._state, metrics = train_step(self._state, batch, step_key)
                    self._pending_metrics.append((metrics, 1))
                    tl["iteration"].append(it)
                    tl["learning_rate"].append(host_lr(self._config, it))
                elapsed = time.time() - t0

                if progress_callback is not None:
                    progress_callback(it, metrics)

                if self._preempt_requested and it < max_iterations:
                    logger.warning(
                        "SIGTERM received: writing preemption checkpoint at "
                        "iteration %d and exiting cleanly (resume with "
                        "run_from_pretrained)", it)
                    self.preempted = True
                    break

                if it % logging_rate == 0:
                    self._materialize_metrics()
                    self._flush_tensorboard(it)
                    logger.info(
                        "iter %d/%d loss=%.4f match=%.4f (%.3fs/iter)",
                        it, max_iterations, tl["loss"][-1], tl["match_loss"][-1],
                        elapsed,
                    )

                if it % save_rate == 0:
                    self._materialize_metrics()
                    self.save_network(it)

                if (eval_step is not None and test_rate > 0
                        and it % test_rate == 0 and it > 5):
                    test_metrics = []
                    for _ in range(int(t.get("test_loss_num_iterations", 50)) // max(self._batch_size, 1) or 1):
                        key, ek = jax.random.split(key)
                        tb = self._dataset_test.make_host_batch(self._batch_size)
                        test_metrics.append(jax.device_get(eval_step(self._state, tb, ek)))
                    te = self._logging_dict["test"]
                    te["iteration"].append(it)
                    for k in ("loss", "match_loss", "non_match_loss"):
                        te[k].append(float(np.mean([m[k] for m in test_metrics])))
        finally:
            if _old_sigterm is not None:
                signal.signal(signal.SIGTERM, _old_sigterm)

        if prefetch is not None:
            prefetch.stop()
        self._materialize_metrics()
        self._flush_tensorboard(it)
        if self._tb_writer is not None:
            self._tb_writer.close()
        self.save_network(it)
        return self._logging_dir

    def _materialize_metrics(self):
        """Drain queued per-dispatch metric dicts into the logging lists with
        one batched device_get — per-element fetches cost a full round trip
        each (they dominated the loop through the TPU tunnel)."""
        if not self._pending_metrics:
            return
        fetched = jax.device_get([m for m, _ in self._pending_metrics])
        tl = self._logging_dict["train"]
        keys = ("loss", "match_loss", "masked_non_match_loss",
                "background_non_match_loss", "blind_non_match_loss")
        for vals, (_, k_steps) in zip(fetched, self._pending_metrics):
            for k in keys:
                v = np.asarray(vals[k]).reshape(-1)
                tl[k].extend(float(x) for x in (v if k_steps > 1 else v[:1]))
        self._pending_metrics = []

    # -- conveniences ------------------------------------------------------------------

    def get_dcn(self) -> DenseCorrespondenceNetwork:
        """Wrap the current state as an inference DCN."""
        net_cfg = self._config["dense_correspondence_network"]
        dcn = DenseCorrespondenceNetwork(
            self._model,
            jax.device_get(self._current_variables()),
            descriptor_dimension=net_cfg["descriptor_dimension"],
            image_width=net_cfg["image_width"],
            image_height=net_cfg["image_height"],
            normalize=net_cfg.get("normalize", False),
            config=net_cfg,
        )
        return dcn
