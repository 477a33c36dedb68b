"""Hamburger matrix-decomposition context head + HRNet wrapper.

Re-design of reference lib/models/hamburger/{ham.py,burger.py} and
lib/models/pose_hrnet_hamburger.py:17-88: the "ham" low-rank context module
factorises the flattened feature map X (D x N) as W H with R components via
multiplicative NMF updates, reconstructs the low-rank context, and a
"bread" conv sandwich (lower/upper 1x1 convs + skip) wraps it.  The
reference's one-step gradient trick (ham.py:14-271: iterate under no_grad,
backprop only the last step) maps to ``lax.stop_gradient`` around all but
the final update.  The vendored sync_bn DataParallel machinery
(lib/models/hamburger/sync_bn/) is obsolete here — SPMD BatchNorm is
globally correct by construction.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import spatial_softmax
from .hrnet import HRNetBackbone, HRNetOutput, StageCfg
from .layers import ConvBN, conv_init
from ..ops.upsample import upsample_bilinear_align_corners

Dtype = Any


def nmf_update(x: jax.Array, w: jax.Array, h: jax.Array, eps: float = 1e-6):
    """One multiplicative NMF update (reference ham.py NMF2D steps).

    x: (B, D, N) nonneg; w: (B, D, R); h: (B, R, N).
    """
    hp = jax.lax.Precision.HIGHEST
    # H <- H * (W^T X) / (W^T W H)
    wtx = jnp.einsum("bdr,bdn->brn", w, x, precision=hp)
    wtwh = jnp.einsum("bdr,bds,bsn->brn", w, w, h, precision=hp)
    h = h * wtx / (wtwh + eps)
    # W <- W * (X H^T) / (W H H^T)
    xht = jnp.einsum("bdn,brn->bdr", x, h, precision=hp)
    whht = jnp.einsum("bds,bsn,brn->bdr", w, h, h, precision=hp)
    w = w * xht / (whht + eps)
    return w, h


def vq_update(x: jax.Array, w: jax.Array, inv_t: float = 100.0):
    """One soft vector-quantisation EM step (reference ham.py VQ2D):
    E: soft-assign columns of X to bases by negative distance at
    temperature INV_T; M: bases become assignment-weighted means.
    x (B, D, N); w (B, D, R) -> (w, h (B, R, N))."""
    hp = jax.lax.Precision.HIGHEST
    d2 = (
        jnp.sum(w**2, axis=1)[:, :, None]
        - 2.0 * jnp.einsum("bdr,bdn->brn", w, x, precision=hp)
        + jnp.sum(x**2, axis=1)[:, None, :]
    )
    h = jax.nn.softmax(-inv_t * d2 / jnp.maximum(jnp.mean(d2), 1e-12), axis=1)
    w = jnp.einsum("bdn,brn->bdr", x, h, precision=hp) / \
        jnp.maximum(jnp.sum(h, axis=2)[:, None, :], 1e-6)
    return w, h


def cd_update(x: jax.Array, w: jax.Array, inv_t: float = 100.0):
    """One concept-decomposition step (reference ham.py CD2D): cosine-
    similarity soft assignment + re-normalised weighted means."""
    hp = jax.lax.Precision.HIGHEST
    wn = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-6)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-6)
    sim = jnp.einsum("bdr,bdn->brn", wn, xn, precision=hp)
    h = jax.nn.softmax(inv_t * sim, axis=1)
    w = jnp.einsum("bdn,brn->bdr", x, h, precision=hp)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-6)
    return w, h


class NMFHam(nn.Module):
    """Low-rank matrix-decomposition context (reference ham.py:14-271).

    ``ham_type``: 'NMF' (multiplicative updates), 'VQ' (soft vector
    quantisation) or 'CD' (concept decomposition) — the three decompositions
    of the reference's _MatrixDecomposition2DBase family, all with the
    one-step gradient trick.
    """

    rank: int = 64
    train_steps: int = 6
    eval_steps: int = 7
    ham_type: str = "NMF"
    inv_t: float = 100.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, hh, ww, d = x.shape
        n = hh * ww
        flat = x.astype(jnp.float32)
        if self.ham_type == "NMF":
            flat = jax.nn.relu(flat)  # NMF needs non-negative data
        flat = flat.reshape(b, n, d).transpose(0, 2, 1)

        # fixed random bases (reference RAND_INIT, ham.py)
        w0 = self.variable(
            "ham_bases", "w",
            lambda: jax.random.uniform(jax.random.key(0), (1, d, self.rank))).value
        w = jnp.broadcast_to(w0, (b, d, self.rank))
        h = jnp.full((b, self.rank, n), 1.0 / self.rank, jnp.float32)

        if self.ham_type == "NMF":
            update = lambda w, h: nmf_update(flat, w, h)
        elif self.ham_type == "VQ":
            update = lambda w, h: vq_update(flat, w, self.inv_t)
        elif self.ham_type == "CD":
            update = lambda w, h: cd_update(flat, w, self.inv_t)
        else:
            raise ValueError(f"unknown HAM_TYPE {self.ham_type!r}")

        steps = self.train_steps if train else self.eval_steps
        # one-step gradient trick: only the final update is differentiated
        def no_grad_updates(w, h):
            for _ in range(steps - 1):
                w, h = update(w, h)
            return w, h

        w, h = jax.lax.stop_gradient(no_grad_updates(w, h))
        w, h = update(w, h)
        recon = jnp.einsum("bdr,brn->bdn", w, h,
                           precision=jax.lax.Precision.HIGHEST)
        return recon.transpose(0, 2, 1).reshape(b, hh, ww, d).astype(x.dtype)


class Hamburger(nn.Module):
    """Bread-ham-bread sandwich, V2-style (reference burger.py:18-208)."""

    channels: int = 512
    rank: int = 64
    train_steps: int = 6
    eval_steps: int = 7
    ham_type: str = "NMF"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inp = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, kernel_init=conv_init(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="lower_bread")(x)
        y = NMFHam(self.rank, self.train_steps, self.eval_steps,
                   ham_type=self.ham_type, dtype=self.dtype, name="ham")(y, train)
        y = ConvBN(x.shape[-1], 1, 1, relu=False, dtype=self.dtype,
                   name="upper_bread")(y, train)
        return nn.relu(inp + y)


class PoseHRNetHamburger(nn.Module):
    """HRNet + hamburger context before the final head
    (reference pose_hrnet_hamburger.py:17-88)."""

    stage2: StageCfg
    stage3: StageCfg
    stage4: StageCfg
    num_joints: int = 21
    rank: int = 64
    train_steps: int = 6
    eval_steps: int = 7
    ham_type: str = "NMF"
    trainable_softmax: bool = False
    heatmap_softmax: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> HRNetOutput:
        xs = HRNetBackbone(self.stage2, self.stage3, self.stage4,
                           dtype=self.dtype, name="backbone")(x, train)
        h, w = xs[0].shape[1:3]
        feats = [xs[0]] + [upsample_bilinear_align_corners(t, (h, w)) for t in xs[1:]]
        features = jnp.concatenate(feats, axis=-1)

        y = Hamburger(512, self.rank, self.train_steps, self.eval_steps,
                      self.ham_type, dtype=self.dtype,
                      name="hamburger")(features, train)
        y = ConvBN(features.shape[-1], 1, 1, relu=True, use_bias=True,
                   dtype=self.dtype, name="head_cb")(y, train)
        y = nn.Conv(self.num_joints, (1, 1), kernel_init=conv_init(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="final_conv")(y)

        if not self.heatmap_softmax:
            return HRNetOutput(y.astype(jnp.float32), features, None, None)
        temp = self.param("trainable_temp", nn.initializers.ones, ())
        if not self.trainable_softmax:
            temp = jax.lax.stop_gradient(temp)
        return HRNetOutput(spatial_softmax(y, temp), features, temp, None)


def hamburger_from_cfg(cfg):
    extra = cfg.MODEL.EXTRA
    return PoseHRNetHamburger(
        stage2=StageCfg.from_cfg(extra["STAGE2"]),
        stage3=StageCfg.from_cfg(extra["STAGE3"]),
        stage4=StageCfg.from_cfg(extra["STAGE4"]),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        rank=int(cfg.MODEL.R),
        train_steps=int(cfg.MODEL.TRAIN_STEPS),
        eval_steps=int(cfg.MODEL.EVAL_STEPS),
        ham_type=str(cfg.MODEL.HAM_TYPE),
        trainable_softmax=bool(cfg.MODEL.TRAINABLE_SOFTMAX),
        heatmap_softmax=bool(cfg.MODEL.HEATMAP_SOFTMAX),
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE) if "TPU" in cfg else jnp.bfloat16,
    )
