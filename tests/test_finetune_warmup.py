"""FineTuneDecoderWarmUp semantics (reference
`nnUNetTrainerFineTuneDecoderWarmUp.py:33-140`, `polylr.py:28-73`): encoder
params receive NO updates while frozen, and the LR trace follows the two-phase
ContinuedPoly warmup schedule."""

from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import make_synthetic_dataset, set_paths


def _reference_continued_poly(epoch, start, initial, warmup_lr, warmup, total,
                              final, exponent=0.9):
    """Direct transcription of the reference scheduler's step() arithmetic."""
    if epoch < warmup + start:
        return warmup_lr + (initial - warmup_lr) * (max(0, epoch - start) / warmup)
    decay_steps = total - start - warmup
    adjusted = epoch - start - warmup
    return final + (initial - final) * (1 - adjusted / decay_steps) ** exponent


def test_schedule_matches_reference_shape():
    from nnuzoo_tpu.training.schedulers import (
        continued_poly_lr_with_warmup, finetune_double_warmup_lr)

    sched = continued_poly_lr_with_warmup(1e-3, total_epochs=250,
                                          warmup_epochs=50, start_epoch=50)
    for e in (50, 60, 99, 100, 150, 249):
        expect = _reference_continued_poly(e, 50, 1e-3, 1e-5, 50, 250, 1e-5)
        assert abs(float(sched(e)) - expect) < 1e-9, e

    # two-phase trainer schedule: freeze 50, enc warmup 25, dec warmup 50
    full = finetune_double_warmup_lr(1e-3, 250, 50, 25, 50)
    for e in range(0, 250, 7):
        if e < 50:  # phase 1: ContinuedPoly(start=0, total=50, warmup=25)
            expect = _reference_continued_poly(e, 0, 1e-3, 1e-5, 25, 50, 1e-5)
        else:       # phase 2: ContinuedPoly(start=50, total=250, warmup=50)
            expect = _reference_continued_poly(e, 50, 1e-3, 1e-5, 50, 250, 1e-5)
        assert abs(float(full(e)) - expect) < 1e-9, e
    # warmup starts low, peaks at initial_lr, decays to final
    assert float(full(0)) == pytest.approx(1e-5)
    assert float(full(25)) == pytest.approx(1e-3)
    assert float(full(50 + 50)) == pytest.approx(1e-3)
    assert float(full(249)) < 2e-4


def test_encoder_frozen_then_unfrozen(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    make_synthetic_dataset(raw, num_cases=4, shape=(72, 72, 8))
    from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                         preprocess)
    extract_fingerprints([999], num_processes=1)
    plan_experiments([999])
    from nnuzoo_tpu.utilities.io import join, load_json, save_json
    plans_file = join(pp, "Dataset999_Synth", "nnUNetPlans.json")
    plans = load_json(plans_file)
    plans["configurations"]["2d"]["patch_size"] = [64, 64]
    plans["configurations"]["2d"]["batch_size"] = 2
    save_json(plans, plans_file, sort_keys=False)
    preprocess([999], configurations=("2d",), num_processes=(1,))

    from nnuzoo_tpu.training.trainer import Trainer
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    trainer = Trainer(plans, "2d", fold=0, dataset_json=dataset_json,
                      trainer_name="nnUNetTrainerFineTuneDecoderWarmUp")
    cfg = trainer.config
    assert cfg.scheduler == "finetune_warmup"
    assert cfg.freeze_encoder_epochs == 50 and cfg.initial_lr == 1e-3
    # shrink: 1 freeze epoch of 2 iters, then 1 unfrozen epoch
    trainer.config = replace(cfg, num_epochs=2, num_iterations_per_epoch=2,
                             num_val_iterations_per_epoch=1,
                             freeze_encoder_epochs=1, encoder_warmup_epochs=1,
                             decoder_warmup_epochs=1)
    trainer.initialize()
    mask = trainer._encoder_freeze_mask(trainer.state["params"])
    n_enc = sum(1 for m in jax.tree.leaves(mask) if m)
    n_all = len(jax.tree.leaves(mask))
    assert 0 < n_enc < n_all  # stages+mergings marked, decoder/heads not

    p0 = jax.tree.map(np.asarray, trainer.state["params"])
    trainer.on_train_start()
    trainer.train_epoch()           # epoch 0: encoder frozen
    p1 = jax.tree.map(np.asarray, trainer.state["params"])

    def max_delta(a, b, sel):
        return max((float(np.max(np.abs(x - y)))
                    for x, y, m in zip(jax.tree.leaves(a), jax.tree.leaves(b),
                                       jax.tree.leaves(mask)) if m == sel),
                   default=0.0)

    assert max_delta(p0, p1, True) == 0.0    # encoder untouched (no wd either)
    assert max_delta(p0, p1, False) > 0.0    # decoder/heads trained
    trainer.current_epoch = 1
    trainer.train_epoch()           # epoch 1: unfrozen
    p2 = jax.tree.map(np.asarray, trainer.state["params"])
    assert max_delta(p1, p2, True) > 0.0     # encoder now updates
