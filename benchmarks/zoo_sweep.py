"""Canonical-scale zoo sweep: full train step (device augmentation + fwd + DS
loss + bwd + AdamW, bf16) at the reference's AbdomenMR 2d workload
(b12 @ 256x224) for every trainer name given on the command line.

    python benchmarks/zoo_sweep.py nnUNetTrainerSwT2Net nnUNetTrainerLM2Net ...

Prints one row per model: steps/s + param count, or the failure reason.
Timings fence with a scalar loss fetch (block_until_ready is a no-op under
the axon relay).
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _common  # noqa: F401,E402  (persistent compile cache)

DEFAULT_SWEEP = [
    "nnUNetTrainerSwT2Net",
    "nnUNetTrainerUNETR2Net",
    "nnUNetTrainerLM2Net",
    "nnUNetTrainerLM2NetP",
    "nnUNetTrainerLightMamba2Net",
    "nnUNetTrainerLightMamba2NetP",
    "nnUNetTrainerSSND2NetP",
    "nnUNetTrainerSSND2Net",
    "nnUNetTrainerMambaND2Net",
    "nnUNetTrainerUNETR",
    "nnUNetTrainerU2NetMulti",
    "nnUNetTrainerLightSS2DMambaUNet",
    "nnUNetTrainerSwinUMamba",
    "nnUNetTrainerSwinUMambaD",
]


def build_plans(patch):
    """2d (len-2 patch) or 3d_fullres (len-3 patch) canonical plans. The 3d
    arch mirrors a planner-derived AbdomenCT 3d_fullres (6 stages, 320-cap
    features, anisotropy-aware first/last strides)."""
    from nnuzoo_tpu.plans.plans_handler import PlansManager
    three_d = len(patch) == 3
    cfg_name = "3d_fullres" if three_d else "2d"
    if three_d:
        arch = {
            "network_class_name": "PlainConvUNet",
            "arch_kwargs": {
                "n_stages": 6,
                "features_per_stage": [32, 64, 128, 256, 320, 320],
                "kernel_sizes": [[1, 3, 3]] + [[3, 3, 3]] * 5,
                "strides": [[1, 1, 1], [1, 2, 2]] + [[2, 2, 2]] * 3 +
                           [[1, 2, 2]],
                "n_conv_per_stage": [2] * 6,
                "n_conv_per_stage_decoder": [2] * 5,
            }}
        batch, spacing = 2, [2.5, 0.8, 0.8]
    else:
        arch = {
            "network_class_name": "PlainConvUNet",
            "arch_kwargs": {
                "n_stages": 5,
                "features_per_stage": [32, 64, 128, 256, 512],
                "kernel_sizes": [[3, 3]] * 5,
                "strides": [[1, 1]] + [[2, 2]] * 4,
                "n_conv_per_stage": [2] * 5,
                "n_conv_per_stage_decoder": [2] * 4,
            }}
        batch, spacing = 12, [1.0, 1.0]
    plans = {
        "dataset_name": "Dataset999_Sweep", "plans_name": "nnUNetPlans",
        "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
        "image_reader_writer": "NiftiIO",
        "configurations": {cfg_name: {
            "data_identifier": f"nnUNetPlans_{cfg_name}", "batch_size": batch,
            "patch_size": list(patch), "spacing": spacing,
            "normalization_schemes": ["ZScoreNormalization"],
            "use_mask_for_norm": [False], "batch_dice": True,
            "architecture": arch}},
    }
    dataset_json = {"channel_names": {"0": "MRI"},
                    "labels": {"background": 0, "organ": 1, "tumor": 2},
                    "numTraining": 10, "file_ending": ".nii.gz"}
    pm = PlansManager(plans)
    return pm, pm.get_configuration(cfg_name), dataset_json


def ds_scales_for(trainer_name, model, patch, in_ch):
    """Per-output scales from the model's ACTUAL output shapes (same probe as
    Trainer._probe_output_scales) — robust to stage clamping/truncation."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from nnuzoo_tpu.training.trainer_config import get_trainer_config
    if not get_trainer_config(trainer_name).enable_deep_supervision:
        return None
    x = jax.ShapeDtypeStruct((1, *patch, in_ch), jnp.float32)
    outs, _ = jax.eval_shape(partial(model.init_with_output, train=False),
                             jax.random.PRNGKey(0), x)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    return tuple(tuple(o.shape[1 + i] / patch[i] for i in range(len(patch)))
                 for o in outs)


def sweep_one(trainer_name, patch=(256, 224), batch=12, n_steps=10,
              remat=False):
    import jax
    import jax.numpy as jnp
    import optax

    from nnuzoo_tpu.data.augment import AugmentConfig, augment_train_batch
    from nnuzoo_tpu.models.registry import get_model_builder
    from nnuzoo_tpu.training.losses import (deep_supervision_loss,
                                            dice_ce_loss,
                                            get_deep_supervision_weights)

    from nnuzoo_tpu.training.trainer_config import get_trainer_config
    pm, cfg, dataset_json = build_plans(patch)
    enable_ds = get_trainer_config(trainer_name).enable_deep_supervision
    model = get_model_builder(trainer_name)(pm, dataset_json, cfg, 1,
                                            deep_supervision=enable_ds)
    if remat and hasattr(model, "remat"):
        import dataclasses
        model = dataclasses.replace(model, remat=True)
    x = jnp.zeros((batch, *patch, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    tx = optax.chain(optax.clip_by_global_norm(12.0),
                     optax.adamw(1e-4, weight_decay=5e-2, eps=1e-5))
    opt_state = tx.init(params)
    ips = tuple(int(np.ceil(p * 1.18)) for p in patch)
    ds = ds_scales_for(trainer_name, model, patch, 1)
    aug_cfg = AugmentConfig(patch_size=patch, initial_patch_size=ips,
                            rotation=np.pi if len(patch) == 2 else np.pi / 6,
                            mirror_axes=tuple(range(len(patch))),
                            use_mask_for_norm=(False,),
                            deep_supervision_scales=ds)

    def cast(p):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                            if a.dtype == jnp.float32 else a, p)

    def train_step(params, opt_state, data, seg, key):
        aug_key, drop_key = jax.random.split(key)
        data_aug, targets = augment_train_batch(aug_cfg, aug_key, data, seg)
        if ds is None:
            targets = [targets] if not isinstance(targets, (list, tuple)) \
                else targets

        def loss_fn(p):
            xin = jnp.moveaxis(data_aug, 1, -1).astype(jnp.bfloat16)
            outputs = model.apply(cast(p), xin, train=True,
                                  rngs={"dropout": drop_key})
            if not isinstance(outputs, (list, tuple)):
                outputs = [outputs]
            outputs = [o.astype(jnp.float32) for o in outputs]
            w = get_deep_supervision_weights(len(outputs))
            return deep_supervision_loss(
                lambda o, t: dice_ce_loss(jnp.moveaxis(o, -1, 1), t,
                                          batch_dice=True),
                outputs, list(targets)[:len(outputs)], w)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    jit_step = jax.jit(train_step, donate_argnums=(0, 1))
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(batch, 1, *ips).astype(np.float32))
    seg = jnp.asarray((rng.rand(batch, 1, *ips) > 0.7).astype(np.int16))

    params, opt_state, loss = jit_step(params, opt_state, data, seg,
                                       jax.random.PRNGKey(0))
    l0 = float(loss)
    t0 = time.time()
    for i in range(n_steps):
        params, opt_state, loss = jit_step(params, opt_state, data, seg,
                                           jax.random.PRNGKey(i + 1))
    l1 = float(loss)
    sps = n_steps / (time.time() - t0)
    return sps, n_params, l0, l1


DEFAULT_SWEEP_3D = [
    "nnUNetTrainer",           # 3d_fullres PlainConvUNet
    "nnUNetTrainerMambaND2Net",
    "nnUNetTrainerSSND2Net",
]


def main():
    """``zoo_sweep.py [--3d] [trainer ...]``. --3d runs the canonical
    3d_fullres workload (48x192x192 b2, planner-derived AbdomenCT-like);
    default is the canonical 2d AbdomenMR workload (256x224 b12)."""
    args = [a for a in sys.argv[1:] if a not in ("--3d", "--remat")]
    three_d = "--3d" in sys.argv[1:]
    remat = "--remat" in sys.argv[1:]
    if three_d:
        names = args or DEFAULT_SWEEP_3D
        # planner-scale AbdomenCT-like voxel count (48x192x192 = 1.77M/sample)
        # at a geometry whose per-axis halvings divide every X2Net stage patch
        patch, batch, n_steps = (64, 160, 160), 2, 5
    else:
        names = args or DEFAULT_SWEEP
        patch, batch, n_steps = (256, 224), 12, 10
    print(f"canonical sweep: b{batch} {'x'.join(map(str, patch))} bf16",
          flush=True)
    for name in names:
        try:
            sps, n_params, l0, l1 = sweep_one(name, patch, batch, n_steps,
                                              remat=remat)
            print(f"{name:40s} {sps:7.3f} steps/s  {n_params / 1e6:7.1f}M "
                  f"params  loss {l0:.3f}->{l1:.3f}", flush=True)
        except Exception as e:
            msg = f"{type(e).__name__}: {str(e)[:160]}"
            print(f"{name:40s} FAILED  {msg}", flush=True)
            traceback.print_exc(limit=2)


if __name__ == "__main__":
    main()
