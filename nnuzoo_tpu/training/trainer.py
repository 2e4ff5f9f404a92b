"""The training runtime.

One ``Trainer`` class + the ``TRAINER_CONFIGS`` table replaces the reference's
``nnUNetTrainer`` and its 19 subclasses (`nnunetv2/training/nnUNetTrainer/
nnUNetTrainer.py:79-1733`). Lifecycle parity: fold splitting (splits_final.json,
seeded 5-fold), 250 train / 50 val iterations per epoch, EMA-pseudo-dice best
checkpointing, checkpoint_latest every epoch, PolyLR/Cosine schedules, grad-clip 12.

TPU-native execution model:
- ONE jitted train step: device-side augmentation -> channels-last forward ->
  deep-supervision loss -> grads -> optax update, with donated state.
- Data parallel over a ``jax.sharding.Mesh('data')``: the batch is sharded, params
  replicated; XLA inserts the gradient/loss collectives (replaces DDP/NCCL,
  SyncBatchNorm is moot — InstanceNorm everywhere).
- Host side: PatchSampler thread + DevicePrefetcher double buffering (replaces the
  12-28 augmentation worker processes).
"""

import os
import time
from dataclasses import asdict
from datetime import datetime
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..data.augment import AugmentConfig, augment_train_batch, get_patch_size, \
    prepare_val_batch
from ..data.dataset import (DatasetNumpy, infer_dataset_class,
                            unpack_dataset)
from ..data.loader import DevicePrefetcher
from ..data.patch_sampler import PatchSampler
from ..configuration import ANISO_THRESHOLD
from ..models.registry import get_model_builder
from ..parallel.mesh import (get_data_mesh, shard_batch_spec,
                             shard_global_batch)
from ..plans.label_handling import determine_num_input_channels
from ..plans.plans_handler import PlansManager
from ..utilities.crossval import generate_crossval_split
from ..utilities.file_path_utilities import get_output_folder
from ..utilities.io import (isfile, join, load_json, load_pickle, maybe_mkdir,
                            save_json, save_pickle)
from .logger import TrainingLogger
from .losses import (deep_supervision_loss, dice_bce_loss, dice_ce_loss,
                     get_deep_supervision_weights, hard_dice_stats)
from .schedulers import linear_warmup_cosine_annealing, per_step, poly_lr
from .trainer_config import TrainerConfig, get_trainer_config


def cosine_annealing(initial_lr, max_epochs, eta_min):
    import math

    def schedule(epoch):
        t = jnp.minimum(epoch, max_epochs) / max_epochs
        return eta_min + (initial_lr - eta_min) * (1 + jnp.cos(jnp.pi * t)) / 2
    return schedule


class Trainer:
    def __init__(self, plans: dict, configuration: str, fold, dataset_json: dict,
                 unpack_dataset_flag: bool = True, device=None,
                 num_epochs: Optional[int] = None,
                 trainer_name: str = "nnUNetTrainer"):
        self.trainer_name = trainer_name
        self.config: TrainerConfig = get_trainer_config(trainer_name)
        if num_epochs is not None:
            from dataclasses import replace
            self.config = replace(self.config, num_epochs=num_epochs)

        self.plans_manager = PlansManager(plans)
        self.configuration_manager = self.plans_manager.get_configuration(configuration)
        self.configuration_name = configuration
        self.fold = fold
        self.dataset_json = dataset_json
        self.label_manager = self.plans_manager.get_label_manager(dataset_json)
        self.target_type = dataset_json.get("target_type", "segmentation")
        self.unpack_dataset_flag = unpack_dataset_flag

        self.preprocessed_dataset_folder_base = join(
            os.environ.get("nnUNet_preprocessed", ""), self.plans_manager.dataset_name)
        self.preprocessed_dataset_folder = join(
            self.preprocessed_dataset_folder_base,
            self.configuration_manager.data_identifier)
        self.output_folder_base = get_output_folder(
            self.plans_manager.dataset_name, trainer_name,
            self.plans_manager.plans_name, configuration)
        self.output_folder = join(self.output_folder_base, f"fold_{fold}")

        self.num_input_channels = determine_num_input_channels(
            self.plans_manager, self.configuration_manager, dataset_json)

        self._dataset_class = None
        self.current_epoch = 0
        self._best_ema = None
        self.logger = TrainingLogger()
        self.inference_allowed_mirroring_axes = None
        self.state = None  # dict(params, opt_state, step)
        self.model = None
        self.mesh = None
        self._train_step_fn = None
        self._val_step_fn = None
        self._rng = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
        self.was_initialized = False
        # rank-0-only writes, reference DDP convention (local_rank == 0 guards
        # around checkpoint/log/plot writes in nnUNetTrainer)
        self.is_rank0 = jax.process_index() == 0

        maybe_mkdir(self.output_folder)
        ts = datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        self.log_file = join(self.output_folder, f"training_log_{ts}.txt")

        # capture constructor args for checkpoint self-description
        self.my_init_kwargs = {"plans": plans, "configuration": configuration,
                               "fold": fold, "dataset_json": dataset_json,
                               "trainer_name": trainer_name}

    @property
    def dataset_class(self):
        """Storage backend inferred from the preprocessed folder's file endings
        (reference `nnunet_dataset.py:313`: npz/npy -> numpy, b2nd -> blosc2)."""
        if self._dataset_class is None:
            self._dataset_class = infer_dataset_class(
                self.preprocessed_dataset_folder)
        return self._dataset_class

    # ----------------------------------------------------------------- logging
    def print_to_log_file(self, *args, also_print_to_console=True,
                          add_timestamp=True):
        if add_timestamp:
            args = (f"{datetime.now()}:", *args)
        if self.is_rank0:
            try:
                with open(self.log_file, "a+") as f:
                    f.write(" ".join(str(a) for a in args) + "\n")
            except IOError:
                pass
        if also_print_to_console and self.is_rank0:
            print(*args)

    # ----------------------------------------------------------------- DS scales
    def _get_deep_supervision_scales(self):
        cfg = self.config
        if not cfg.enable_deep_supervision:
            return None
        dim = len(self.configuration_manager.patch_size)
        if cfg.ds_mode == "arch":
            strides = self.configuration_manager.pool_op_kernel_sizes
            cum = np.cumprod(np.vstack(strides), axis=0)
            scales = list(list(1 / i) for i in cum)[:-1]  # drop the deepest
            return tuple(tuple(float(x) for x in s) for s in scales)
        if cfg.ds_mode == "fullres":
            return tuple((1.0,) * dim for _ in range(cfg.num_ds_outputs))
        if cfg.ds_mode == "halving":
            probed = self._probe_output_scales()
            if probed is not None:
                return probed
            return tuple(tuple(1.0 / (2 ** i) for _ in range(dim))
                         for i in range(cfg.num_ds_outputs))
        if cfg.ds_mode == "x2net":
            # the nominal plan (reference `nnUNetTrainerM2Net.py:49-56`) is
            # d0, d1 full-res then halving, but at small patch sizes the
            # X2Net merges clamp/truncate, so derive the TRUE scales from the
            # model's output shapes (trace-only eval_shape, no compile)
            probed = self._probe_output_scales()
            if probed is not None:
                return probed
            scales = [(1.0,) * dim, (1.0,) * dim]
            for i in range(cfg.num_ds_outputs - 2):
                scales.append(tuple(1.0 / (2 ** (i + 1)) for _ in range(dim)))
            return tuple(scales)
        raise RuntimeError(f"unknown ds_mode {cfg.ds_mode}")

    def _probe_output_scales(self):
        """Per-output spatial scales from the model's actual output shapes at
        the configured patch size (abstract trace; DS targets built from these
        always match, whatever the architecture's clamping/truncation does)."""
        if self.model is None:
            return None
        patch = tuple(int(i) for i in self.configuration_manager.patch_size)
        x = jax.ShapeDtypeStruct((1, *patch, self.num_input_channels),
                                 jnp.float32)
        outs, _ = jax.eval_shape(
            partial(self.model.init_with_output, train=False),
            jax.random.PRNGKey(0), x)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        return tuple(tuple(o.shape[1 + i] / patch[i] for i in range(len(patch)))
                     for o in outs)

    # ----------------------------------------------------------------- aug setup
    def configure_rotation_dummyDA_mirroring_and_initial_patch_size(self):
        """Reference `nnUNetTrainer.py:491-532`."""
        patch_size = self.configuration_manager.patch_size
        dim = len(patch_size)
        if dim == 2:
            do_dummy_2d = False
            rotation = (np.pi * 15 / 180) if max(patch_size) / min(patch_size) > 1.5 \
                else np.pi
            mirror_axes = (0, 1)
        elif dim == 3:
            do_dummy_2d = (max(patch_size) / patch_size[0]) > ANISO_THRESHOLD
            rotation = np.pi if do_dummy_2d else (np.pi * 30 / 180)
            mirror_axes = (0, 1, 2)
        else:
            raise RuntimeError(f"unsupported dim {dim}")

        initial_patch_size = get_patch_size(
            patch_size[-dim:], (-rotation, rotation), (-rotation, rotation),
            (-rotation, rotation), (0.85, 1.25))
        if do_dummy_2d:
            initial_patch_size[0] = patch_size[0]
        self.inference_allowed_mirroring_axes = mirror_axes
        return rotation, do_dummy_2d, tuple(int(i) for i in initial_patch_size), \
            mirror_axes

    def _make_augment_config(self) -> Tuple[AugmentConfig, AugmentConfig]:
        rotation, do_dummy_2d, initial_patch_size, mirror_axes = \
            self.configure_rotation_dummyDA_mirroring_and_initial_patch_size()
        ds_scales = self._get_deep_supervision_scales()
        regions = None
        if self.label_manager.has_regions:
            regions = [tuple(r) if isinstance(r, (list, tuple)) else (r,)
                       for r in self.label_manager.foreground_regions]
            if self.label_manager.has_ignore_label:
                regions = regions + [(self.label_manager.ignore_label,)]
            regions = tuple(regions)
        patch_size = tuple(int(i) for i in self.configuration_manager.patch_size)
        is_cascaded = self.configuration_manager.previous_stage_name is not None
        common = dict(
            patch_size=patch_size,
            mirror_axes=tuple(mirror_axes),
            do_dummy_2d=do_dummy_2d,
            use_mask_for_norm=tuple(bool(b) for b in
                                    self.configuration_manager.use_mask_for_norm),
            deep_supervision_scales=ds_scales,
            regions=regions,
            rotation=float(rotation),
            is_cascaded=is_cascaded,
            foreground_labels=tuple(int(l) for l in
                                    self.label_manager.foreground_labels)
            if is_cascaded else (),
            target_type=self.target_type,
        )
        train_cfg = AugmentConfig(initial_patch_size=initial_patch_size, **common)
        val_cfg = AugmentConfig(initial_patch_size=patch_size, **common)
        return train_cfg, val_cfg

    # ----------------------------------------------------------------- init
    def _build_optimizer(self):
        cfg = self.config
        steps_per_epoch = cfg.num_iterations_per_epoch
        if cfg.scheduler == "poly":
            epoch_sched = poly_lr(cfg.initial_lr, cfg.num_epochs)
        elif cfg.scheduler == "cosine":
            epoch_sched = cosine_annealing(cfg.initial_lr, cfg.num_epochs,
                                           cfg.cosine_eta_min)
        elif cfg.scheduler == "finetune_warmup":
            from .schedulers import finetune_double_warmup_lr
            epoch_sched = finetune_double_warmup_lr(
                cfg.initial_lr, cfg.num_epochs, cfg.freeze_encoder_epochs,
                cfg.encoder_warmup_epochs, cfg.decoder_warmup_epochs)
        else:
            raise RuntimeError(f"unknown scheduler {cfg.scheduler}")
        self._epoch_schedule = epoch_sched
        sched = per_step(epoch_sched, steps_per_epoch)

        if cfg.optimizer == "sgd":
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip_norm),
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(learning_rate=sched, momentum=cfg.momentum,
                          nesterov=cfg.nesterov),
            )
        elif cfg.optimizer == "adamw":
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip_norm),
                optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay,
                            eps=cfg.adam_eps, b1=0.9, b2=0.999),
            )
        elif cfg.optimizer == "adam":
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip_norm),
                optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay,
                            eps=cfg.adam_eps),  # torch Adam w/ weight_decay ~ adamw-ish L2
            )
        else:
            raise RuntimeError(f"unknown optimizer {cfg.optimizer}")
        return tx

    def initialize(self):
        if self.was_initialized:
            return
        builder = get_model_builder(self.trainer_name)
        self.enable_deep_supervision = self.config.enable_deep_supervision
        self.model = builder(self.plans_manager, self.dataset_json,
                             self.configuration_manager, self.num_input_channels,
                             self.config.enable_deep_supervision)
        self.train_aug_cfg, self.val_aug_cfg = self._make_augment_config()

        dim = len(self.configuration_manager.patch_size)
        example = jnp.zeros(
            (1, *self.configuration_manager.patch_size, self.num_input_channels),
            jnp.float32)
        self._rng, init_key = jax.random.split(self._rng)
        params = jax.jit(self.model.init)(init_key, example)
        self.tx = self._build_optimizer()
        opt_state = self.tx.init(params)
        self.state = {"params": params, "opt_state": opt_state,
                      "step": jnp.zeros((), jnp.int32)}

        # data-parallel mesh + reference DDP batch semantics: the GLOBAL batch
        # is split across processes, per-process oversample adjusted so the
        # globally-last 33% are the force-fg samples (nnUNetTrainer.py:410-453)
        import math
        mp_all = int(os.environ.get("NNUZOO_MODEL_PARALLEL",
                                    self.config.model_parallel))
        if jax.process_count() > 1:
            assert jax.device_count() % mp_all == 0, (
                f"model_parallel={mp_all} must divide {jax.device_count()}")
            n_data_global = jax.device_count() // mp_all
            self.global_batch_size, self.local_batch_size, self.local_oversample = \
                shard_global_batch(self.configuration_manager.batch_size,
                                   self.config.oversample_foreground_percent,
                                   n_devices=n_data_global)
            if self.global_batch_size != self.configuration_manager.batch_size:
                self.print_to_log_file(
                    f"global batch rounded {self.configuration_manager.batch_size}"
                    f" -> {self.global_batch_size} (device-count multiple)")
            if mp_all > 1:
                # combined dp+tp across processes: ('data', 'model') mesh over
                # ALL devices, wide weights sharded over 'model'
                from ..parallel.mesh import (get_2d_mesh,
                                             shard_params_channelwise)
                self.mesh = get_2d_mesh(n_data_global, mp_all)
                params, _ = shard_params_channelwise(params, self.mesh)
                opt_state = self.tx.init(params)
                self.state = {"params": params, "opt_state": opt_state,
                              "step": jnp.zeros((), jnp.int32)}
                self.print_to_log_file(
                    f"multi-host tensor parallelism: mesh "
                    f"data={n_data_global} x model={mp_all}")
            else:
                self.mesh = get_data_mesh()  # all devices across all processes
        else:
            self.global_batch_size = self.local_batch_size = \
                self.configuration_manager.batch_size
            self.local_oversample = self.config.oversample_foreground_percent
            mp = int(os.environ.get("NNUZOO_MODEL_PARALLEL",
                                    self.config.model_parallel))
            if mp > 1:
                # combined data + channel-wise tensor parallelism over a
                # ('data', 'model') mesh: wide weights sharded over 'model',
                # GSPMD inserts the collectives. Params are placed with their
                # tensor shardings BEFORE optimizer init so the optimizer
                # state inherits the layout.
                from ..parallel.mesh import (get_2d_mesh,
                                             shard_params_channelwise)
                assert jax.device_count() % mp == 0, \
                    f"model_parallel={mp} must divide {jax.device_count()} devices"
                avail = jax.device_count() // mp
                n_data = max(1, math.gcd(self.global_batch_size, avail))
                self.mesh = get_2d_mesh(n_data, mp)
                params, _ = shard_params_channelwise(params, self.mesh)
                opt_state = self.tx.init(params)
                self.state = {"params": params, "opt_state": opt_state,
                              "step": jnp.zeros((), jnp.int32)}
                self.print_to_log_file(
                    f"tensor parallelism: mesh data={n_data} x model={mp}")
            else:
                # use as many devices as evenly divide the batch
                n_dev = math.gcd(self.global_batch_size, jax.device_count())
                self.mesh = get_data_mesh(num_devices=max(1, n_dev))
        self._build_step_fns()
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        self.print_to_log_file(
            f"Initialized {self.trainer_name} ({type(self.model).__name__}), "
            f"{n_params / 1e6:.2f}M params, devices={jax.device_count()}")
        self.was_initialized = True

    # ----------------------------------------------------------------- step fns
    def _compute_loss(self, outputs: List[jnp.ndarray], targets: List[jnp.ndarray]):
        """outputs channels-last, targets (B, S, *spatial)."""
        batch_dice = self.configuration_manager.batch_dice
        has_regions = self.label_manager.has_regions
        ignore_label = self.label_manager.ignore_label

        def to_cf(o):  # channels-last -> channels-first for the loss fns
            return jnp.moveaxis(o, -1, 1)

        if self.target_type == "translation":
            fn = lambda o, t: jnp.mean((to_cf(o) - t.astype(jnp.float32)) ** 2)
        elif has_regions:
            fn = lambda o, t: dice_bce_loss(
                to_cf(o), t, batch_dice=batch_dice,
                use_ignore_label=ignore_label is not None)
        else:
            fn = lambda o, t: dice_ce_loss(
                to_cf(o), t, batch_dice=batch_dice, ignore_label=ignore_label)

        if not self.config.enable_deep_supervision:
            return fn(outputs[0], targets[0])
        weights = get_deep_supervision_weights(len(outputs))
        return deep_supervision_loss(fn, outputs, targets[:len(outputs)], weights)

    @staticmethod
    def _encoder_freeze_mask(params):
        """Static boolean pytree marking encoder params of the X2Net family:
        the reference freezes stage1..6 + patch_merging1..4 (`m2net.py:958-971`,
        pool56 has no params)."""
        import re
        from jax.tree_util import tree_map_with_path
        pat = re.compile(r"^(stage[1-6]|patch_merging[1-4])$")

        def is_enc(path, _):
            return any(pat.match(str(getattr(k, "key", "")))
                       for k in path)
        return tree_map_with_path(is_enc, params)

    def _build_step_fns(self):
        model = self.model
        train_cfg = self.train_aug_cfg
        val_cfg = self.val_aug_cfg
        tx = self.tx

        env_bf16 = os.environ.get("NNUZOO_BF16", "")
        if env_bf16 in ("0", "1"):
            use_bf16 = env_bf16 == "1"
        elif self.config.use_bf16 is not None:
            use_bf16 = self.config.use_bf16
        else:  # auto: bf16 on TPU (the analogue of autocast-on-cuda)
            use_bf16 = jax.devices()[0].platform == "tpu"
        if use_bf16:
            self.print_to_log_file("mixed precision: bf16 compute, fp32 "
                                   "master weights")

        def to_cl(x):  # (B, C, *spatial) -> channels-last
            x = jnp.moveaxis(x, 1, -1)
            return x.astype(jnp.bfloat16) if use_bf16 else x

        def cast_params(params):
            if not use_bf16:
                return params
            return jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)

        if self.target_type == "ssl":
            # MAE epoch: image-only augmentation, the model masks input windows
            # and returns (reconstruction loss, recon, mask)
            # (reference hooks `nnUNetTrainer.py:114,1491-1516`,
            # `data_loader.py:188-236`, `u2net_multi.py:560-632`)
            def ssl_train_step(state, data, seg, key):
                aug_key, mask_key, drop_key = jax.random.split(key, 3)
                data_aug, _ = augment_train_batch(train_cfg, aug_key, data, None)

                def loss_fn(params):
                    loss, _, _ = model.apply(
                        cast_params(params), to_cl(data_aug), train=True,
                        rngs={"mask": mask_key, "dropout": drop_key})
                    return loss.astype(jnp.float32)

                loss, grads = jax.value_and_grad(loss_fn)(state["params"])
                updates, new_opt = tx.update(grads, state["opt_state"],
                                             state["params"])
                new_params = optax.apply_updates(state["params"], updates)
                return {"params": new_params, "opt_state": new_opt,
                        "step": state["step"] + 1}, loss

            def ssl_val_step(params, data, seg):
                loss, _, _ = model.apply(
                    cast_params(params), to_cl(data), train=False,
                    rngs={"mask": jax.random.PRNGKey(0)})
                zero = jnp.zeros((1,))
                return loss.astype(jnp.float32), zero, zero, zero

            self._train_step_fn = jax.jit(ssl_train_step, donate_argnums=(0,))
            self._val_step_fn = jax.jit(ssl_val_step)
            return

        # FineTuneDecoderWarmUp: zero encoder grads AND updates while
        # step < freeze_steps (reference freezes via requires_grad=False, so
        # frozen params get neither gradient nor weight-decay updates)
        freeze_steps = (self.config.freeze_encoder_epochs *
                        self.config.num_iterations_per_epoch)
        enc_mask = self._encoder_freeze_mask(self.state["params"]) \
            if freeze_steps else None

        def mask_frozen(tree, step):
            if not freeze_steps:
                return tree
            live = (step >= freeze_steps)
            return jax.tree.map(
                lambda t, m: t * live.astype(t.dtype) if m else t,
                tree, enc_mask)

        def train_step(state, data, seg, key):
            aug_key, drop_key = jax.random.split(key)
            data_aug, targets = augment_train_batch(train_cfg, aug_key, data, seg)

            def loss_fn(params):
                outputs = model.apply(cast_params(params), to_cl(data_aug),
                                      train=True,
                                      rngs={"dropout": drop_key})
                outputs = [o.astype(jnp.float32) for o in outputs]
                return self._compute_loss(outputs, targets)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            grads = mask_frozen(grads, state["step"])
            updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
            updates = mask_frozen(updates, state["step"])
            new_params = optax.apply_updates(state["params"], updates)
            return {"params": new_params, "opt_state": new_opt,
                    "step": state["step"] + 1}, loss

        def val_step(params, data, seg):
            data_p, targets = prepare_val_batch(val_cfg, data, seg)
            outputs = model.apply(cast_params(params), to_cl(data_p), train=False)
            outputs = [o.astype(jnp.float32) for o in outputs]
            loss = self._compute_loss(outputs, targets)
            if self.target_type == "translation":
                zero = jnp.zeros((1,))
                return loss, zero, zero, zero
            logits_cf = jnp.moveaxis(outputs[0], -1, 1)
            target0 = targets[0]
            lm = self.label_manager
            if lm.has_ignore_label:
                if not lm.has_regions:
                    mask = (target0 != lm.ignore_label).astype(jnp.float32)
                    target_d = jnp.where(target0 == lm.ignore_label, 0, target0)
                else:
                    mask = 1.0 - target0[:, -1:]
                    target_d = target0[:, :-1]
            else:
                mask = None
                target_d = target0
            tp, fp, fn = hard_dice_stats(
                logits_cf, target_d,
                num_classes=lm.num_segmentation_heads if not lm.has_regions
                else lm.num_segmentation_heads + 1,
                has_regions=lm.has_regions, ignore_label_mask=mask)
            return loss, tp, fp, fn

        self._train_step_fn = jax.jit(train_step, donate_argnums=(0,))
        self._val_step_fn = jax.jit(val_step)

    # ----------------------------------------------------------------- split
    def do_split(self) -> Tuple[List[str], List[str]]:
        if self.fold == "all":
            keys = self.dataset_class.get_identifiers(
                self.preprocessed_dataset_folder)
            return sorted(keys), sorted(keys)
        splits_file = join(self.preprocessed_dataset_folder_base,
                           "splits_final.json")
        keys = sorted(self.dataset_class.get_identifiers(
            self.preprocessed_dataset_folder))
        if not isfile(splits_file):
            splits = generate_crossval_split(keys, seed=12345, n_splits=5)
            save_json(splits, splits_file)
        else:
            splits = load_json(splits_file)
        fold = int(self.fold)
        if fold >= len(splits):
            raise RuntimeError(f"fold {fold} requested but only {len(splits)} "
                               f"splits available")
        tr_keys = splits[fold]["train"]
        val_keys = splits[fold]["val"]
        if self.config.data_fraction < 1.0:
            rng = np.random.RandomState(12345)
            n = max(1, int(len(tr_keys) * self.config.data_fraction))
            tr_keys = list(rng.choice(tr_keys, n, replace=False))
        return tr_keys, val_keys

    # ----------------------------------------------------------------- data
    def get_dataloaders(self):
        tr_keys, val_keys = self.do_split()
        prev_stage_folder = None
        if self.configuration_manager.previous_stage_name is not None:
            # the previous stage wrote its predictions under OUR config name
            # (reference: predicted_next_stage/<next_stage_name>)
            prev_stage_folder = join(
                self.preprocessed_dataset_folder_base,
                "predicted_next_stage", self.configuration_name)
        ds_tr = self.dataset_class(self.preprocessed_dataset_folder, tr_keys,
                             folder_with_segs_from_previous_stage=prev_stage_folder)
        ds_val = self.dataset_class(self.preprocessed_dataset_folder, val_keys,
                              folder_with_segs_from_previous_stage=prev_stage_folder)
        dim = len(self.configuration_manager.patch_size)

        # multi-host: each process samples only its slice of the global batch
        # with a per-rank oversample fraction (reference DDP semantics,
        # `nnUNetTrainer.py:410-453`); seeds differ per process so slices are
        # independent draws
        host_seed = None if jax.process_count() == 1 else \
            12345 + jax.process_index()
        train_sampler = PatchSampler(
            ds_tr, self.local_batch_size, seed=host_seed,
            initial_patch_size=self.train_aug_cfg.initial_patch_size[-dim:],
            final_patch_size=tuple(self.configuration_manager.patch_size),
            label_manager=self.label_manager,
            oversample_foreground_percent=self.local_oversample,
            target_type=self.target_type)
        val_sampler = PatchSampler(
            ds_val, self.local_batch_size, seed=host_seed,
            initial_patch_size=self.configuration_manager.patch_size,
            final_patch_size=self.configuration_manager.patch_size,
            label_manager=self.label_manager,
            oversample_foreground_percent=self.local_oversample,
            target_type=self.target_type)

        sharding = shard_batch_spec(self.mesh)
        self.dataloader_train = DevicePrefetcher(train_sampler, buffer_size=2,
                                                 sharding=sharding)
        self.dataloader_val = DevicePrefetcher(val_sampler, buffer_size=2,
                                               sharding=sharding)

    # ----------------------------------------------------------------- epochs
    def train_epoch(self) -> float:
        losses = []
        for _ in range(self.config.num_iterations_per_epoch):
            batch = next(self.dataloader_train)
            self._rng, key = jax.random.split(self._rng)
            self.state, loss = self._train_step_fn(
                self.state, batch["data"], batch["target"], key)
            losses.append(loss)
        return float(np.mean([float(l) for l in losses]))

    def validation_epoch(self):
        losses, tps, fps, fns = [], [], [], []
        for _ in range(self.config.num_val_iterations_per_epoch):
            batch = next(self.dataloader_val)
            loss, tp, fp, fn = self._val_step_fn(
                self.state["params"], batch["data"], batch["target"])
            losses.append(float(loss))
            tps.append(np.asarray(tp))
            fps.append(np.asarray(fp))
            fns.append(np.asarray(fn))
        if self.target_type in ("translation", "ssl"):
            # no dice for regression/MAE; track -val_loss so EMA 'best' works
            return float(np.mean(losses)), np.array([-float(np.mean(losses))])
        tp, fp, fn = np.sum(tps, 0), np.sum(fps, 0), np.sum(fns, 0)
        global_dc_per_class = 2 * tp / np.clip(2 * tp + fp + fn, 1e-8, None)
        return float(np.mean(losses)), global_dc_per_class

    def run_training(self):
        self.on_train_start()
        cfg = self.config
        profile_dir = os.environ.get("NNUZOO_PROFILE_DIR")
        if profile_dir and self.current_epoch == 0:
            # profile the first epoch (ad-hoc tracing; the reference only has
            # print-based timing spans)
            with jax.profiler.trace(profile_dir):
                t0 = time.time()
                self.logger.log("epoch_start_timestamps", t0, 0)
                train_loss = self.train_epoch()
                val_loss, dice = self.validation_epoch()
                self.logger.log("train_losses", train_loss, 0)
                self.logger.log("val_losses", val_loss, 0)
                self.logger.log("mean_fg_dice", float(np.nanmean(dice)), 0)
                self.logger.log("dice_per_class_or_region",
                                [float(d) for d in dice], 0)
                self.logger.log("lrs", float(self._epoch_schedule(0)), 0)
                self.logger.log("epoch_end_timestamps", time.time(), 0)
                self.on_epoch_end()
                self.current_epoch += 1
            self.print_to_log_file(f"Profile written to {profile_dir}")
        try:
            while self.current_epoch < cfg.num_epochs:
                epoch = self.current_epoch
                t0 = time.time()
                self.logger.log("epoch_start_timestamps", t0, epoch)
                train_loss = self.train_epoch()
                val_loss, dice_per_class = self.validation_epoch()
                mean_fg_dice = float(np.nanmean(dice_per_class))

                self.logger.log("train_losses", train_loss, epoch)
                self.logger.log("val_losses", val_loss, epoch)
                self.logger.log("mean_fg_dice", mean_fg_dice, epoch)
                self.logger.log("dice_per_class_or_region",
                                [float(d) for d in dice_per_class], epoch)
                self.logger.log("lrs", float(self._epoch_schedule(epoch)), epoch)
                self.logger.log("epoch_end_timestamps", time.time(), epoch)

                self.print_to_log_file(
                    f"Epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f} "
                    f"pseudo-dice {[round(float(d), 4) for d in dice_per_class]} "
                    f"({time.time() - t0:.1f}s)")

                self.on_epoch_end()
                self.current_epoch += 1
        except KeyboardInterrupt:
            self.save_checkpoint(join(self.output_folder, "checkpoint_latest.pth"))
            raise
        self.on_train_end()

    def on_train_start(self):
        if not self.was_initialized:
            self.initialize()
        maybe_mkdir(self.output_folder)
        if self.unpack_dataset_flag and self.dataset_class is DatasetNumpy:
            unpack_dataset(self.preprocessed_dataset_folder, num_processes=4)
        self.get_dataloaders()
        if self.is_rank0:
            save_json(self.plans_manager.plans,
                      join(self.output_folder_base, "plans.json"), sort_keys=False)
            save_json(self.dataset_json,
                      join(self.output_folder_base, "dataset.json"))
            self._save_debug_information()

    def _save_debug_information(self):
        dbg = {"trainer_name": self.trainer_name,
               "config": asdict(self.config),
               "configuration": self.configuration_name,
               "fold": self.fold,
               "num_input_channels": self.num_input_channels,
               "devices": [str(d) for d in jax.devices()],
               "jax_version": jax.__version__}
        save_json(dbg, join(self.output_folder, "debug.json"))

    def on_epoch_end(self):
        epoch = self.current_epoch
        if (epoch + 1) % self.config.save_every == 0 and \
                epoch != self.config.num_epochs - 1:
            self.save_checkpoint(join(self.output_folder, "checkpoint_latest.pth"))
        ema = self.logger.my_fantastic_logging["ema_fg_dice"][epoch]
        if self._best_ema is None or ema > self._best_ema:
            self._best_ema = ema
            self.print_to_log_file(f"New best EMA pseudo dice: {ema:.4f}")
            self.save_checkpoint(join(self.output_folder, "checkpoint_best.pth"))
        if self.is_rank0:
            self.logger.plot_progress_png(self.output_folder)

    def on_train_end(self):
        self.current_epoch -= 1
        self.save_checkpoint(join(self.output_folder, "checkpoint_final.pth"))
        self.current_epoch += 1
        latest = join(self.output_folder, "checkpoint_latest.pth")
        if self.is_rank0 and isfile(latest):
            os.remove(latest)
        for dl in (getattr(self, "dataloader_train", None),
                   getattr(self, "dataloader_val", None)):
            if dl is not None:
                dl.stop()
        self.print_to_log_file("Training done.")

    # ----------------------------------------------------------------- final val
    def perform_actual_validation(self, save_probabilities: bool = False) -> dict:
        """Sliding-window inference over the validation fold + Dice summary
        (reference `nnUNetTrainer.py:1354-1504`)."""
        from ..evaluation.metrics import compute_metrics_on_folder
        from ..inference.export import export_prediction_from_logits
        from ..inference.predictor import Predictor

        if self.target_type == "ssl":
            # MAE pretraining has no segmentation to export/evaluate
            # (reference falls through to log_qualitative_step,
            # `nnUNetTrainer.py:1515-1516`)
            self.print_to_log_file(
                "target_type=ssl: skipping final validation (no labels); "
                "use the checkpoint with load_pretrained_weights for "
                "fine-tuning")
            return {}

        predictor = Predictor(tile_step_size=0.5, use_gaussian=True,
                              use_mirroring=True,
                              allowed_mirroring_axes=None)
        predictor.manual_initialization(
            get_model_builder(self.trainer_name)(
                self.plans_manager, self.dataset_json, self.configuration_manager,
                self.num_input_channels, deep_supervision=False),
            [self.state["params"]], self.plans_manager, self.configuration_manager,
            self.dataset_json, self.trainer_name,
            self.inference_allowed_mirroring_axes)

        validation_output_folder = join(self.output_folder, "validation")
        maybe_mkdir(validation_output_folder)
        _, val_keys = self.do_split()
        dataset_val = self.dataset_class(self.preprocessed_dataset_folder,
                                         val_keys)
        # multi-host: stripe validation cases over processes (reference
        # `val_keys[rank::world]`, nnUNetTrainer.py:1387), sync before metrics
        if jax.process_count() > 1:
            val_keys = val_keys[jax.process_index()::jax.process_count()]

        for k in val_keys:
            data, seg, seg_prev, properties = dataset_val.load_case(k)
            data = np.asarray(data, dtype=np.float32)
            if seg_prev is not None:
                from ..plans.label_handling import convert_labelmap_to_one_hot
                data = np.vstack([data, convert_labelmap_to_one_hot(
                    np.asarray(seg_prev)[0], self.label_manager.foreground_labels,
                    np.float32)])
            logits = predictor.predict_sliding_window_return_logits(data)
            export_prediction_from_logits(
                logits, properties, self.configuration_manager, self.plans_manager,
                self.dataset_json, join(validation_output_folder, k),
                save_probabilities)

        # cascade: export resampled predictions as next-stage inputs
        # (reference `nnUNetTrainer.py:1449-1481`)
        next_stages = self.configuration_manager.next_stage_names
        if next_stages:
            from ..inference.export import resample_and_save
            for next_stage in next_stages:
                next_cfg = self.plans_manager.get_configuration(next_stage)
                target_dir = join(self.preprocessed_dataset_folder_base,
                                  "predicted_next_stage", next_stage)
                maybe_mkdir(target_dir)
                ds_next = DatasetNumpy(
                    join(self.preprocessed_dataset_folder_base,
                         next_cfg.data_identifier))
                for k in val_keys:
                    if k not in ds_next.identifiers:
                        continue
                    data, seg, _, props = dataset_val.load_case(k)
                    logits = predictor.predict_sliding_window_return_logits(
                        np.asarray(data, dtype=np.float32))
                    target_shape = ds_next.load_case(k)[0].shape[1:]
                    resample_and_save(logits, target_shape,
                                      join(target_dir, k), self.plans_manager,
                                      self.configuration_manager, props,
                                      self.dataset_json)

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("nnuzoo_validation_done")
            if not self.is_rank0:
                return {}

        gt_folder = join(self.preprocessed_dataset_folder_base, "gt_segmentations")
        if self.target_type == "translation":
            from ..evaluation.metrics import compute_metrics_on_folder_reg
            metrics = compute_metrics_on_folder_reg(
                gt_folder, validation_output_folder,
                join(validation_output_folder, "summary.json"),
                self.plans_manager.image_reader_writer_class(),
                self.dataset_json["file_ending"], num_processes=4)
            self.print_to_log_file(f"Validation (regression): "
                                   f"{metrics['foreground_mean']}")
            return metrics
        lm = self.label_manager
        metrics = compute_metrics_on_folder(
            gt_folder, validation_output_folder,
            join(validation_output_folder, "summary.json"),
            self.plans_manager.image_reader_writer_class(),
            self.dataset_json["file_ending"],
            lm.foreground_regions if lm.has_regions else lm.foreground_labels,
            lm.ignore_label, num_processes=4)
        self.print_to_log_file(
            f"Validation complete. Mean Dice: "
            f"{metrics['foreground_mean']['Dice']:.4f}")
        return metrics

    def set_deep_supervision_enabled(self, enabled: bool):
        # models take deep_supervision at construction; nothing mutable needed here
        pass

    # ----------------------------------------------------------------- checkpoint
    def save_checkpoint(self, filename: str) -> None:
        if not self.is_rank0:
            return
        state_np = jax.tree.map(np.asarray, self.state)
        checkpoint = {
            "network_weights": serialization.to_bytes(state_np["params"]),
            "optimizer_state": serialization.to_bytes(state_np["opt_state"]),
            "step": int(state_np["step"]),
            "logging": self.logger.get_checkpoint(),
            "_best_ema": self._best_ema,
            "current_epoch": self.current_epoch + 1,
            "init_args": self.my_init_kwargs,
            "trainer_name": self.trainer_name,
            "inference_allowed_mirroring_axes": self.inference_allowed_mirroring_axes,
        }
        save_pickle(checkpoint, filename)

    def load_checkpoint(self, filename_or_checkpoint) -> None:
        if not self.was_initialized:
            self.initialize()
        ckpt = filename_or_checkpoint
        if isinstance(ckpt, str):
            ckpt = load_pickle(ckpt)
        params = serialization.from_bytes(
            jax.tree.map(np.asarray, self.state["params"]), ckpt["network_weights"])
        opt_state = serialization.from_bytes(
            jax.tree.map(np.asarray, self.state["opt_state"]),
            ckpt["optimizer_state"])
        self.state = {"params": jax.tree.map(jnp.asarray, params),
                      "opt_state": jax.tree.map(jnp.asarray, opt_state),
                      "step": jnp.asarray(ckpt["step"], jnp.int32)}
        self.logger.load_checkpoint(ckpt["logging"])
        self._best_ema = ckpt["_best_ema"]
        self.current_epoch = ckpt["current_epoch"]
        self.inference_allowed_mirroring_axes = \
            ckpt["inference_allowed_mirroring_axes"]


def load_trainer_from_checkpoint(checkpoint_path: str) -> Trainer:
    """Re-instantiate a trainer from a checkpoint's captured init args
    (reference `load_checkpoint` semantics, `nnUNetTrainer.py:1316-1352`)."""
    ckpt = load_pickle(checkpoint_path)
    kwargs = ckpt["init_args"]
    trainer = Trainer(**kwargs)
    trainer.initialize()
    trainer.load_checkpoint(ckpt)
    return trainer
