"""Model registry: trainer-name -> network builder.

The reference selects models by trainer class name scanned from disk
(`nnunetv2/run/run_training.py:31-68`) and has two incompatible
``build_network_architecture`` signatures (see SURVEY.md §7 "known
inconsistencies"). Here there is ONE builder interface:

    builder(plans_manager, dataset_json, configuration_manager,
            num_input_channels, deep_supervision, dtype) -> nn.Module

registered per trainer name. Architecture-class-name strings found in plans
(including the reference's fully-qualified torch names) resolve through
``ARCH_CLASSES`` so reference plans files work unchanged.
"""

from typing import Callable, Dict

import jax.numpy as jnp

from ..plans.label_handling import determine_num_input_channels
from .dynamic_unet import PlainConvUNet, ResidualEncoderUNet

ARCH_CLASSES = {
    "PlainConvUNet": PlainConvUNet,
    "ResidualEncoderUNet": ResidualEncoderUNet,
    "dynamic_network_architectures.architectures.unet.PlainConvUNet": PlainConvUNet,
    "dynamic_network_architectures.architectures.residual_unet.ResidualEncoderUNet":
        ResidualEncoderUNet,
}


def build_network_from_plans(plans_manager, dataset_json, configuration_manager,
                             num_input_channels=None, deep_supervision=True,
                             dtype=jnp.float32):
    """Generic arch-from-plans builder (reference
    `nnunetv2/utilities/get_network_from_plans.py:18-62`)."""
    arch_name = configuration_manager.network_arch_class_name
    if arch_name not in ARCH_CLASSES:
        raise RuntimeError(f"Unknown architecture {arch_name!r}. "
                           f"Known: {sorted(ARCH_CLASSES)}")
    label_manager = plans_manager.get_label_manager(dataset_json)
    arch_kwargs = dict(configuration_manager.network_arch_init_kwargs)
    return ARCH_CLASSES[arch_name](
        arch_kwargs=arch_kwargs,
        num_classes=label_manager.num_segmentation_heads,
        deep_supervision=deep_supervision,
        dtype=dtype)


# trainer name -> builder; populated by model modules at import time
MODEL_BUILDERS: Dict[str, Callable] = {}


def register_model(trainer_names, builder: Callable) -> None:
    if isinstance(trainer_names, str):
        trainer_names = [trainer_names]
    for n in trainer_names:
        MODEL_BUILDERS[n] = builder


def get_model_builder(trainer_name: str) -> Callable:
    _ensure_registered()
    if trainer_name in MODEL_BUILDERS:
        return MODEL_BUILDERS[trainer_name]
    # data-percentage variants (nnUNetTrainer_05Percent etc.) use the base model
    for suffix in ("_05Percent", "_10Percent", "_25Percent", "_50Percent",
                   "_75Percent"):
        if trainer_name.endswith(suffix):
            return get_model_builder(trainer_name[: -len(suffix)])
    raise RuntimeError(f"No model registered for trainer {trainer_name!r}. "
                       f"Known: {sorted(MODEL_BUILDERS)}")


_REGISTERED = False


def _ensure_registered():
    """Import model modules so their register_model calls run."""
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    from . import zoo  # noqa: F401  (imports all model families)


register_model(["nnUNetTrainer", "nnUNetTrainerResEncUNet"],
               build_network_from_plans)
