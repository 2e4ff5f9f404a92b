"""Benchmark: flagship-model (M2NetP / SS2D2Net-small) training throughput.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Canonical workload (reference AbdomenMR 2d plans): batch 12 @ 256x224, full
training step = device-side augmentation + forward + deep-supervision loss +
backward + AdamW, bf16 compute with fp32 master weights, per-stage remat.

## A100 baseline derivation (replaces the round-1 placeholder)

No wall-clock number for the reference's A100 `mamba_ssm` training exists in
the repo or paper (the paper only notes SS2D2Net's "significantly longer
training time" vs the CNNs, README.md:19). We therefore derive a first-
principles estimate and document every assumption:

- Workload characteristics (XLA HLO cost analysis of the canonical step, this
  repo, bf16): ~1.26 TFLOP (w/o remat recompute) and ~540 GB of HBM traffic
  per step with full XLA fusion -> arithmetic intensity ~3 FLOP/byte. The
  model is HBM-BANDWIDTH-bound on any modern accelerator (roofline crossover:
  A100 needs >150 FLOP/byte to be compute-bound, TPU v5e >240).
- A100-80GB peak HBM bandwidth: 2.0 TB/s.
- The reference implementation is eager PyTorch: `mamba_ssm`'s scan kernel is
  fused, but each SS2D block's surrounding ops (4-direction gather/flip/
  transpose, x_proj/dt einsums, LayerNorm, SiLU gating) materialize to HBM
  per op, and the scan itself runs fp32. Published bandwidth efficiencies
  for eager conv/SSM hybrids are 20-40%; with unfused traffic ~2x the fused
  540 GB, the A100 estimate is
      2*540e9 B / (2.0e12 B/s * 0.35 eff) ~ 1.5 s/step  ->  ~0.65 steps/s,
  with an optimistic bound (fully-fused traffic, 60% eff) of ~2.2 steps/s.
- vs_baseline is reported against the CENTRAL estimate 1.1 steps/s (geometric
  mean of the 0.65-2.2 range, rounded). This is an estimate, not a
  measurement; an apples-to-apples A100 run of the reference supersedes it.

Context: a v5e chip has 0.41x the A100's HBM bandwidth, so on this bandwidth-
bound model per-chip parity already implies ~2.4x higher bandwidth efficiency.

NOTE: under the axon relay jax.block_until_ready does NOT block; a scalar
device->host fetch is the only reliable fence. All timings fetch the loss.
"""

import json
import os
import sys
import time

import numpy as np

A100_BASELINE_STEPS_PER_SEC = 1.1   # central estimate, derivation above


def _enable_compile_cache():
    """Persistent XLA compile cache: the canonical program's compile dwarfs the
    measured 20-step loop (the Pallas scan kernels compile per (L, KD) shape),
    so repeat runs — including the driver's end-of-round run — should reuse
    this session's executables."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # flag missing on this JAX: repeat runs recompile
        print(f"# compile cache unavailable: {e}", file=sys.stderr)


def _build_step(trainer_name, model, patch, batch, bf16=True):
    import jax
    import jax.numpy as jnp
    import optax

    from nnuzoo_tpu.data.augment import AugmentConfig, augment_train_batch
    from nnuzoo_tpu.training.losses import (deep_supervision_loss, dice_ce_loss,
                                            get_deep_supervision_weights)

    x = jnp.zeros((batch, *patch, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.chain(optax.clip_by_global_norm(12.0),
                     optax.adamw(1e-4, weight_decay=5e-2, eps=1e-5))
    opt_state = tx.init(params)

    ips = tuple(int(np.ceil(p * 1.18)) for p in patch)
    if trainer_name.startswith("nnUNetTrainerM2Net"):
        ds_scales = tuple([(1.0, 1.0), (1.0, 1.0)] +
                          [(0.5 ** i, 0.5 ** i) for i in range(1, 6)])
    else:
        ds_scales = tuple(tuple(0.5 ** i for _ in patch) for i in range(5))
    aug_cfg = AugmentConfig(
        patch_size=patch, initial_patch_size=ips, rotation=np.pi,
        mirror_axes=(0, 1), use_mask_for_norm=(False,),
        deep_supervision_scales=ds_scales)

    def cast(p):
        if not bf16:
            return p
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                            if a.dtype == jnp.float32 else a, p)

    def to_cl(t):
        t = jnp.moveaxis(t, 1, -1)
        return t.astype(jnp.bfloat16) if bf16 else t

    def train_step(params, opt_state, data, seg, key):
        aug_key, drop_key = jax.random.split(key)
        data_aug, targets = augment_train_batch(aug_cfg, aug_key, data, seg)

        def loss_fn(p):
            outputs = model.apply(cast(p), to_cl(data_aug), train=True,
                                  rngs={"dropout": drop_key})
            outputs = [o.astype(jnp.float32) for o in outputs]
            w = get_deep_supervision_weights(len(outputs))
            return deep_supervision_loss(
                lambda o, t: dice_ce_loss(jnp.moveaxis(o, -1, 1), t,
                                          batch_dice=True),
                outputs, targets[:len(outputs)], w)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        import optax as _o
        return _o.apply_updates(params, updates), new_opt, loss

    jit_step = jax.jit(train_step, donate_argnums=(0, 1))
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(batch, 1, *ips).astype(np.float32))
    seg = jnp.asarray((rng.rand(batch, 1, *ips) > 0.7).astype(np.int16))
    return jit_step, params, opt_state, data, seg


def _measure(jit_step, params, opt_state, data, seg, n_steps=20):
    import jax
    params, opt_state, loss = jit_step(params, opt_state, data, seg,
                                       jax.random.PRNGKey(0))
    _ = float(loss)  # fence: forces compile + first step
    t0 = time.time()
    for i in range(n_steps):
        params, opt_state, loss = jit_step(params, opt_state, data, seg,
                                           jax.random.PRNGKey(i))
    _ = float(loss)  # params are donated/chained: this forces all n_steps
    return n_steps / (time.time() - t0)


def _emit(name, patch, batch, sps):
    """One JSON result line, flushed immediately. The driver parses the LAST
    such line in the output, so later (bigger/canonical) attempts supersede
    earlier fallbacks — and a compile overrun mid-run still leaves a datum."""
    print(json.dumps({
        "metric": f"{name}_2d_b{batch}_{patch[0]}x{patch[1]}_train_steps_per_sec_per_chip",
        "value": round(sps, 4),
        "unit": "steps/s",
        "vs_baseline": round(sps / A100_BASELINE_STEPS_PER_SEC, 4),
    }), flush=True)


class _Alarm(Exception):
    pass


_WARM_MARKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".jax_cache", "CANONICAL_WARM")


def main():
    import dataclasses
    import signal

    _enable_compile_cache()
    from __graft_entry__ import _flagship_model_and_input

    CANONICAL = ((256, 224), 12, True, 20)   # AbdomenMR 2d, per-stage remat
    CHEAP = [((64, 64), 4, False, 60), ((128, 96), 12, False, 30)]
    # Attempt ordering: a cold cache pays the remote-compile queue per program
    # (minutes to HOURS when the relay's compile service is congested), so run
    # cheapest-first and print a JSON line after EACH success — the driver
    # parses the tail, so a later canonical line supersedes the fallbacks. Once
    # a canonical run has succeeded on this rig (warm marker in .jax_cache),
    # the executables load from the persistent cache and the remaining cost is
    # LOCAL tracing (~minutes for the canonical program on a 1-core host) —
    # run ONLY the canonical attempt so it fits the driver's ~600 s kill
    # window, falling back to the cheap attempts if it fails.
    warm = os.path.exists(_WARM_MARKER)
    attempts = [CANONICAL] if warm else CHEAP + [CANONICAL]
    budget = float(os.environ.get("NNUZOO_BENCH_BUDGET", "560"))
    # device handover through the relay can take minutes when another client
    # holds the chip — start the budget clock only once the device is ours
    import jax
    jax.devices()
    t_start = time.time()
    # repeating timer: a raise inside a C callback (e.g. XLA's GC hook) is
    # swallowed by CPython ("Exception ignored in ..."); the 5 s re-fire makes
    # the next delivery land in Python bytecode and actually propagate.
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_Alarm()))

    model, _, pm, cfg, dataset_json, trainer_name = _flagship_model_and_input()
    any_ok = False
    for patch, batch, remat, n_steps in attempts:
        remaining = budget - (time.time() - t_start)
        if any_ok and remaining < 30:
            print(f"# bench: budget exhausted before {patch} b{batch}",
                  file=sys.stderr)
            break
        try:
            signal.setitimer(signal.ITIMER_REAL, max(60, remaining), 5.0)
            m = dataclasses.replace(model, remat=remat)
            step = _build_step(trainer_name, m, patch, batch, bf16=True)
            sps = _measure(*step, n_steps=n_steps)
            signal.setitimer(signal.ITIMER_REAL, 0)
            _emit(trainer_name, patch, batch, sps)
            any_ok = True
            if patch == CANONICAL[0]:
                try:
                    with open(_WARM_MARKER, "w") as f:
                        f.write("canonical bench executables cached\n")
                except OSError:
                    pass
                if warm:
                    return  # canonical-only fast path: done
        except _Alarm:
            signal.setitimer(signal.ITIMER_REAL, 0)
            print(f"# bench attempt {trainer_name} {patch} b{batch} hit the "
                  f"wall-clock guard ({budget:.0f}s total)", file=sys.stderr)
            if warm and patch == CANONICAL[0]:
                attempts.extend(CHEAP)  # fall back to the cheap attempts
        except Exception as e:
            signal.setitimer(signal.ITIMER_REAL, 0)
            print(f"# bench attempt {trainer_name} {patch} b{batch} failed: "
                  f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
    signal.setitimer(signal.ITIMER_REAL, 0)
    if not any_ok:
        # last resort: PlainConvUNet
        from nnuzoo_tpu.models.registry import get_model_builder
        model = get_model_builder("nnUNetTrainer")(pm, dataset_json, cfg, 1, True)
        step = _build_step("nnUNetTrainer", model, (256, 224), 12, bf16=True)
        _emit("nnUNetTrainer", (256, 224), 12, _measure(*step))


if __name__ == "__main__":
    main()
