"""Resolution-exchange upsampling ops for NHWC feature maps.

HRNet needs two resize flavours (reference lib/models/pose_hrnet.py):
- nearest x2^k inside fuse layers (:206) -> pure reshape/broadcast, free for XLA
- bilinear ``align_corners=True`` in the head (:500-502) -> expressed as two
  small dense interpolation matrices contracted with einsum so the work lands
  on the MXU instead of a gather pipeline.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-neighbour integer upsampling for (B, H, W, C)."""
    if factor == 1:
        return x
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


@lru_cache(maxsize=None)
def _align_corners_matrix(src: int, dst: int) -> np.ndarray:
    """Dense (dst, src) linear-interpolation matrix with align_corners=True.

    out[i] = sum_j W[i, j] * in[j], where the sample position of output i is
    ``i * (src - 1) / (dst - 1)`` (torch F.interpolate align_corners=True).
    """
    if src == 1:
        return np.ones((dst, 1), dtype=np.float32)
    pos = np.arange(dst, dtype=np.float64) * (src - 1) / (dst - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.minimum(lo, src - 2)
    frac = pos - lo
    w = np.zeros((dst, src), dtype=np.float64)
    w[np.arange(dst), lo] = 1.0 - frac
    w[np.arange(dst), lo + 1] = frac
    return w.astype(np.float32)


def upsample_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear align_corners=True resize of (B, H, W, C) to ``out_hw``."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    wh = jnp.asarray(_align_corners_matrix(h, oh))
    ww = jnp.asarray(_align_corners_matrix(w, ow))
    dtype = x.dtype
    # HIGHEST precision: the default TPU/CPU matmul path multiplies f32 inputs
    # in bf16, which visibly perturbs the interpolation weights (0.8 -> 0.8008).
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("Hh,bhwc->bHwc", wh, x.astype(jnp.float32), precision=hp)
    y = jnp.einsum("Ww,bHwc->bHWc", ww, y, precision=hp)
    return y.astype(dtype)
