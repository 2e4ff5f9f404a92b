"""Pretrained-weight transfer (reference: `nnunetv2/run/load_pretrained_weights.py:7-95`):
name- and shape-matched parameter copy between checkpoints, skipping segmentation
heads (``seg``/``side``/``out`` layers), so encoders pretrained on one dataset can
initialize another."""

from typing import Tuple

import jax
import numpy as np
from flax import serialization, traverse_util

from ..utilities.io import load_pickle

_SKIP_SUBSTRINGS = (".seg_layers.", "side", "outconv", "/seg/", "/out/")


def _flat(params):
    return traverse_util.flatten_dict(params, sep="/")


def load_pretrained_weights(target_params, pretrained_checkpoint_path: str,
                            verbose: bool = False) -> Tuple[dict, int]:
    """Returns (new params pytree, number of transferred arrays)."""
    ckpt = load_pickle(pretrained_checkpoint_path)
    # deserialize against the target template: if architectures are identical this
    # works outright; otherwise fall back to msgpack dict restore
    source = serialization.msgpack_restore(ckpt["network_weights"])

    flat_target = _flat(jax.tree.map(np.asarray, target_params))
    flat_source = _flat(source)

    transferred = 0
    new_flat = {}
    for key, value in flat_target.items():
        src = flat_source.get(key)
        skip = any(s in key for s in _SKIP_SUBSTRINGS)
        if src is not None and not skip and np.shape(src) == np.shape(value):
            new_flat[key] = np.asarray(src)
            transferred += 1
            if verbose:
                print(f"transferred {key} {np.shape(src)}")
        else:
            new_flat[key] = value
            if verbose and src is not None and not skip:
                print(f"shape mismatch {key}: {np.shape(src)} vs {np.shape(value)}")
    new_params = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in new_flat.items()})
    return new_params, transferred
