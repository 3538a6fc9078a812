"""Device-side image normalisation for uint8-shipped batches.

Host code ships raw (augmented or center-cropped) uint8 crops —
4x smaller than float32, which matters twice on a remote-device link:
bandwidth (the r3 quality gate was transfer-bound at 0.289 sum/s) and a
measured host-RAM leak proportional to bytes transferred (a 200-epoch
stage-3 run was OOM-killed at 130 GB RSS by per-epoch float32 image
batches). The device applies the identical ``(x/255 - mean)/std``
(reference normalisation constants, ``src/data_utils.py:7-28``) and zeroes
masked rows so padding matches the host float path's exact 0.0.
"""

from __future__ import annotations

import jax.numpy as jnp

from multimodalsum_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD


def normalize_uint8_images(img: jnp.ndarray, img_mask: jnp.ndarray) -> jnp.ndarray:
    """uint8 ``[b, n, H, W, 3]`` NHWC + mask ``[b, n]`` → normalised
    float32, masked rows exactly 0.0 (matching ``stack_images`` padding)."""
    x = img.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x * img_mask[:, :, None, None, None].astype(jnp.float32)
