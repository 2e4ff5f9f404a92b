"""U2NetMulti: N-D U2Net with an optional MAE/SSL masking path (reference:
`nnunetv2/nets/u2net_multi.py:343-725`).

The plain path is the U2Net generalized to 2D/3D (monai Convolution/UpSample in
the reference; our RSU blocks are already N-D). The MAE path masks input windows
with a learned token and returns (loss, reconstruction, mask) for
``target_type`` ssl; for translation the final head regresses channels.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mask_funcs import mae_loss, window_masking
from .registry import register_model
from .u2net import U2Net


class U2NetMulti(nn.Module):
    num_out_channels: int
    dim: int = 2
    small: bool = False
    deep_supervision: bool = True
    mae: bool = False
    mask_ratio: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True, mask_key: Optional[jax.Array] = None):
        imgs = x
        mask = None
        if self.mae and self.mask_ratio > 0:
            mask_token = self.param("mask_token", nn.initializers.zeros,
                                    (1, 1, x.shape[-1]))
            if mask_key is None:
                mask_key = self.make_rng("mask")
            x, mask = window_masking(mask_key, x, mask_token,
                                     mask_ratio=self.mask_ratio)
        outs = U2Net(num_classes=self.num_out_channels, small=self.small,
                     deep_supervision=self.deep_supervision, dim=self.dim,
                     name="u2net")(x, train=train)
        if self.mae and mask is not None:
            loss = mae_loss(imgs, outs[0], mask)
            return loss, outs[0], mask
        return outs


def get_u2net_multi_from_plans(plans_manager, dataset_json, configuration_manager,
                               num_input_channels, deep_supervision=True,
                               dtype=None, small=False):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    target_type = dataset_json.get("target_type", "segmentation")
    mae = target_type == "ssl"
    n_out = num_input_channels if mae else label_manager.num_segmentation_heads
    return U2NetMulti(num_out_channels=n_out, dim=dim, small=small,
                      deep_supervision=deep_supervision and not mae,
                      mae=mae, mask_ratio=0.75 if mae else 0.0)


register_model("nnUNetTrainerU2NetMulti", get_u2net_multi_from_plans)
register_model("nnUNetTrainerU2NetMultiP",
               lambda *a, **k: get_u2net_multi_from_plans(*a, **k, small=True))
