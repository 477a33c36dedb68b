"""Device-side image preprocessing: fused resize + normalise (+ affine).

The reference does all preprocessing per sample on the host with cv2
(warpAffine in the transform chain, cv2.resize in tools/inference.py:119).
For high-throughput TPU serving the whole crop->resize->normalise chain
runs on device under jit, fused by XLA into the first conv's prologue —
this is the ``ops`` half of the >=5k fps inference recipe (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def resize_bilinear(images: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Batched bilinear resize (half-pixel centres, like cv2.resize)."""
    b, h, w, c = images.shape
    return jax.image.resize(images, (b, *out_hw, c), method="bilinear")


def normalize(images: jax.Array) -> jax.Array:
    """uint8/float images -> ImageNet-normalised float (reference ToTensor+
    Normalize)."""
    x = images.astype(jnp.float32)
    x = jnp.where(jnp.asarray(images.dtype == jnp.uint8), x / 255.0, x)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def preprocess_for_inference(images: jax.Array, size: int) -> jax.Array:
    """Fused resize + normalise, jit-friendly (tools/inference.py:118-124)."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    x = resize_bilinear(x, (size, size))
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def affine_warp(images: jax.Array, mats: jax.Array,
                out_hw: Tuple[int, int]) -> jax.Array:
    """Batched inverse-affine warp with bilinear sampling + zero padding.

    mats: (B, 2, 3) forward affines mapping input -> output pixels (the
    convention of data/transforms.affine_matrix); sampling inverts them.
    """
    from .volumetric import bilinear_sample_nhwc

    b = images.shape[0]
    oh, ow = out_hw
    full = jnp.concatenate(
        [mats, jnp.broadcast_to(jnp.asarray([[[0.0, 0.0, 1.0]]]), (b, 1, 3))], axis=1)
    inv = jnp.linalg.inv(full)[:, :2]                      # (B, 2, 3)

    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).reshape(-1, 3)
    src = jnp.einsum("bij,nj->bni", inv, grid)             # (B, N, 2) [x, y]
    out = bilinear_sample_nhwc(images.astype(jnp.float32), src)
    return out.reshape(b, oh, ow, images.shape[-1])
