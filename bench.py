"""Benchmark: flagship-model training throughput on the local accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: SS2D2Net-class training steps/sec/chip at the reference's canonical 2d
workload (batch 12? -- we use the planner-default 2d patch on AbdomenMR-like
shapes: batch 12 @ 256x224, 1 channel, 2 classes). vs_baseline compares against
the A100 mamba_ssm reference estimate in BASELINE.md (target: >= 3x).
"""

import json
import time

import numpy as np

# measured reference context (BASELINE.md): mamba_ssm SS2D2Net on A100 has
# "significantly longer training time" than CNNs; the driver's target is
# steps/sec/chip >= 3x A100 baseline. Until a measured A100 number is provided,
# we report vs a conservative 2.0 steps/s estimate for M2NetP-2d batch-12.
A100_BASELINE_STEPS_PER_SEC = 2.0


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_model_and_input
    from nnuzoo_tpu.data.augment import AugmentConfig, augment_train_batch
    from nnuzoo_tpu.training.losses import (deep_supervision_loss, dice_ce_loss,
                                            get_deep_supervision_weights)

    model, patch, pm, cfg, dataset_json, trainer_name = _flagship_model_and_input()
    B = 12
    x = jnp.zeros((B, *patch, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.chain(optax.clip_by_global_norm(12.0),
                     optax.adamw(1e-4, weight_decay=5e-2, eps=1e-5))
    opt_state = tx.init(params)

    ips = tuple(int(np.ceil(p * 1.18)) for p in patch)
    if trainer_name.startswith("nnUNetTrainerM2Net"):
        # x2net deep-supervision scales: d0/d1 full res, then halving
        ds_scales = tuple([(1.0, 1.0), (1.0, 1.0)] +
                          [(0.5 ** i, 0.5 ** i) for i in range(1, 6)])
    else:
        ds_scales = tuple(tuple(0.5 ** i for _ in patch) for i in range(5))
    aug_cfg = AugmentConfig(
        patch_size=patch, initial_patch_size=ips, rotation=np.pi,
        mirror_axes=(0, 1), use_mask_for_norm=(False,),
        deep_supervision_scales=ds_scales)

    def to_cl(t):
        return jnp.moveaxis(t, 1, -1)

    def train_step(params, opt_state, data, seg, key):
        data_aug, targets = augment_train_batch(aug_cfg, key, data, seg)

        def loss_fn(p):
            outputs = model.apply(p, to_cl(data_aug), train=True)
            w = get_deep_supervision_weights(len(outputs))
            return deep_supervision_loss(
                lambda o, t: dice_ce_loss(jnp.moveaxis(o, -1, 1), t,
                                          batch_dice=True),
                outputs, targets[:len(outputs)], w)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    jit_step = jax.jit(train_step, donate_argnums=(0, 1))

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(B, 1, *ips).astype(np.float32))
    seg = jnp.asarray((rng.rand(B, 1, *ips) > 0.7).astype(np.int16))

    # compile + warmup. NOTE: under the axon relay block_until_ready does not
    # actually block; a scalar device->host fetch is the only reliable fence.
    params, opt_state, loss = jit_step(params, opt_state, data, seg,
                                       jax.random.PRNGKey(0))
    _ = float(loss)

    n_steps = 20
    t0 = time.time()
    for i in range(n_steps):
        params, opt_state, loss = jit_step(params, opt_state, data, seg,
                                           jax.random.PRNGKey(i))
    _ = float(loss)  # forces the whole chained sequence (params are donated)
    dt = (time.time() - t0) / n_steps
    steps_per_sec = 1.0 / dt

    print(json.dumps({
        "metric": f"{trainer_name}_2d_b{B}_{patch[0]}x{patch[1]}_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / A100_BASELINE_STEPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
