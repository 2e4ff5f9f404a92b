"""MAE-style random patch masking for SSL (reference:
`nnunetv2/nets/mask_funcs.py:6-132`): patchify/unpatchify and window masking with
a learned mask token."""

from typing import Tuple

import jax
import jax.numpy as jnp


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, L, patch*patch*C)."""
    B, H, W, C = x.shape
    p = patch
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def unpatchify(tokens: jnp.ndarray, patch: int, H: int, W: int,
               C: int) -> jnp.ndarray:
    B = tokens.shape[0]
    p = patch
    x = tokens.reshape(B, H // p, W // p, p, p, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, C)


def window_masking(key, x: jnp.ndarray, mask_token: jnp.ndarray,
                   mask_ratio: float = 0.75, patch: int = 4
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly replace a fraction of patches with the mask token.

    x (B, H, W, C); mask_token (1, 1, C). Returns (masked x, mask (B, L) with 1 =
    masked). Static shapes: a fixed count of masked patches per sample."""
    B, H, W, C = x.shape
    tokens = patchify(x, patch)  # (B, L, p*p*C)
    L = tokens.shape[1]
    num_mask = int(L * mask_ratio)

    def mask_one(k):
        noise = jax.random.uniform(k, (L,))
        ids = jnp.argsort(noise)
        mask = jnp.zeros((L,)).at[ids[:num_mask]].set(1.0)
        return mask

    keys = jax.random.split(key, B)
    mask = jax.vmap(mask_one)(keys)  # (B, L)

    token_patch = jnp.tile(mask_token.reshape(1, 1, C), (1, 1, patch * patch))
    token_patch = token_patch.reshape(1, 1, patch * patch * C)
    masked_tokens = jnp.where(mask[..., None] > 0, token_patch, tokens)
    return unpatchify(masked_tokens, patch, H, W, C), mask


def mae_loss(imgs: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray,
             patch: int = 4) -> jnp.ndarray:
    """Mean squared error over masked patches only (reference
    `LightMUNet.py:334-351` forward_mae_loss)."""
    t_img = patchify(imgs, patch)
    t_pred = patchify(pred, patch)
    per_patch = jnp.mean((t_pred - t_img) ** 2, axis=-1)  # (B, L)
    return jnp.sum(per_patch * mask) / jnp.clip(jnp.sum(mask), 1.0)
