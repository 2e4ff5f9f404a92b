"""Global configuration knobs.

Mirrors `nnunetv2/configuration.py:5-10`: ``default_num_processes`` from env
``nnUNet_def_n_proc`` and the anisotropy threshold used by planning/resampling.

On this TPU host the heavy lifting happens on-device; host-side pools default to
the CPU count (often 1 in TPU VMs), not a fixed 8.
"""

import os


def default_num_processes() -> int:
    env = os.environ.get("nnUNet_def_n_proc")
    if env is not None:
        return int(env)
    return min(8, os.cpu_count() or 1)


# determines when a sample is considered anisotropic (max_spacing / min_spacing > this)
ANISO_THRESHOLD = 3


def get_allowed_n_proc_DA() -> int:
    """Data-augmentation worker count (reference: `utilities/default_n_proc_DA.py:5-44`,
    a hostname lookup table). TPU-native design does augmentation on-device, so this
    only controls the host-side prefetch thread pool."""
    env = os.environ.get("nnUNet_n_proc_DA")
    if env is not None:
        return int(env)
    return min(12, os.cpu_count() or 1)
