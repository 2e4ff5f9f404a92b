"""Epoch-time benchmarking trainers + result summarizer (reference:
`nnunetv2/batch_running/benchmarking/` — which referenced trainer classes deleted
from that fork; rebuilt functional here).

``run_benchmark`` trains N epochs of a given trainer on a dataset with data
loading enabled or bypassed (synthetic batches) and records the fastest epoch
time into ``benchmark_result.json``; ``summarize_benchmark_results`` collects
those files into a CSV-ish table.
"""

import json
import os
import time
from dataclasses import replace
from typing import List, Optional, Union

from ..run.run_training import get_trainer_from_args
from ..utilities.io import join, load_json, save_json, subdirs


def run_benchmark(dataset_name_or_id, configuration: str = "2d", fold=0,
                  trainer_name: str = "nnUNetTrainer", num_epochs: int = 5,
                  no_data_loading: bool = False) -> dict:
    """Equivalent of nnUNetTrainerBenchmark_5epochs[_noDataLoading]."""
    trainer = get_trainer_from_args(dataset_name_or_id, configuration, fold,
                                    trainer_name)
    trainer.config = replace(trainer.config, num_epochs=num_epochs,
                             num_val_iterations_per_epoch=0 or 1)
    trainer.initialize()
    trainer.on_train_start()

    if no_data_loading:
        import jax
        import numpy as np
        batch = next(trainer.dataloader_train)

        def next_batch():
            return batch
    else:
        def next_batch():
            return next(trainer.dataloader_train)

    import jax
    epoch_times = []
    for epoch in range(num_epochs):
        t0 = time.time()
        for _ in range(trainer.config.num_iterations_per_epoch):
            b = next_batch()
            trainer._rng, key = jax.random.split(trainer._rng)
            trainer.state, loss = trainer._train_step_fn(
                trainer.state, b["data"], b["target"], key)
        _ = float(loss)  # fence
        epoch_times.append(time.time() - t0)

    result = {
        "trainer": trainer_name, "configuration": configuration,
        "num_epochs": num_epochs, "no_data_loading": no_data_loading,
        "epoch_times": epoch_times, "fastest_epoch": min(epoch_times),
        "device": str(jax.devices()[0]),
    }
    save_json(result, join(trainer.output_folder, "benchmark_result.json"))
    for dl in (trainer.dataloader_train, trainer.dataloader_val):
        dl.stop()
    return result


def summarize_benchmark_results(results_root: str, output_file: Optional[str] = None
                                ) -> List[dict]:
    """Collect benchmark_result.json files under a results tree (reference
    `summarize_benchmark_results.py:30-61`)."""
    rows = []
    for root, dirs, files in os.walk(results_root):
        if "benchmark_result.json" in files:
            r = load_json(join(root, "benchmark_result.json"))
            r["path"] = root
            rows.append(r)
    rows.sort(key=lambda r: r["fastest_epoch"])
    if output_file:
        lines = ["trainer,configuration,fastest_epoch_s,device,path"]
        lines += [f"{r['trainer']},{r['configuration']},"
                  f"{r['fastest_epoch']:.2f},{r['device']},{r['path']}"
                  for r in rows]
        with open(output_file, "w") as f:
            f.write("\n".join(lines) + "\n")
    return rows
