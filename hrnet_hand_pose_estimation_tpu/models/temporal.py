"""Temporal models: PredRNN (ST-LSTM) and HRNet-embedding TCN.

Re-designs of:
- lib/models/predrnn.py:7-236 + SpatioTemporalLSTMCell.py: stacked
  spatio-temporal LSTM cells (PredRNN) over per-frame feature maps, with a
  zig-zag memory flow; HRNet_PredRNN couples it to HRNet heatmaps.
- lib/models/hrnet_emb_model.py:186-236 (HRNet_Emb_TCN): per-frame HRNet
  embeddings -> dilated temporal convolutions -> refined centre-frame pose.

The recurrences use ``lax.scan`` over the frame axis (compiler-friendly;
the reference python-loops over time steps).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import decode_heatmaps
from .hrnet import PoseHRNet

Dtype = Any


class STLSTMCell(nn.Module):
    """Spatio-temporal LSTM cell (reference SpatioTemporalLSTMCell.py:7-59):
    a ConvLSTM with an extra spatio-temporal memory M flowing across layers."""

    hidden: int
    filter_size: int = 5
    layer_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, c, m):
        k = self.filter_size
        pad = ((k // 2, k // 2),) * 2

        def conv(inp, features, name):
            y = nn.Conv(features, (k, k), padding=pad, use_bias=not self.layer_norm,
                        dtype=self.dtype, param_dtype=jnp.float32, name=name)(inp)
            if self.layer_norm:
                y = nn.LayerNorm(dtype=jnp.float32, name=name + "_ln")(y)
            return y

        hd = self.hidden
        xcc = conv(x, 7 * hd, "conv_x")
        hcc = conv(h, 4 * hd, "conv_h")
        mcc = conv(m, 3 * hd, "conv_m")

        ix, fx, gx, ixp, fxp, gxp, ox = jnp.split(xcc, 7, axis=-1)
        ih, fh, gh, oh = jnp.split(hcc, 4, axis=-1)
        im, fm, gm = jnp.split(mcc, 3, axis=-1)

        i_t = jax.nn.sigmoid(ix + ih)
        f_t = jax.nn.sigmoid(fx + fh)
        g_t = jnp.tanh(gx + gh)
        c_new = f_t * c + i_t * g_t

        i_tp = jax.nn.sigmoid(ixp + im)
        f_tp = jax.nn.sigmoid(fxp + fm)
        g_tp = jnp.tanh(gxp + gm)
        m_new = f_tp * m + i_tp * g_tp

        mem = jnp.concatenate([c_new, m_new], axis=-1)
        o_t = jax.nn.sigmoid(
            ox + oh + nn.Conv(hd, (k, k), padding=pad, dtype=self.dtype,
                              param_dtype=jnp.float32, name="conv_o")(mem))
        h_new = o_t * jnp.tanh(
            nn.Conv(hd, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_last")(mem))
        return h_new, c_new, m_new


class PredRNN(nn.Module):
    """Stacked ST-LSTM over frame features (reference predrnn.py:61-123)."""

    num_hidden: Sequence[int] = (64, 64, 64, 64)
    out_channels: int = 21
    filter_size: int = 5
    layer_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jax.Array) -> jax.Array:
        """frames: (B, T, H, W, C) -> (B, T, H, W, out_channels)."""
        b, t, h, w, c = frames.shape
        layers = [STLSTMCell(n, self.filter_size, self.layer_norm, self.dtype,
                             name=f"cell{i}") for i, n in enumerate(self.num_hidden)]
        head = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="head")

        hs = [jnp.zeros((b, h, w, n), self.dtype) for n in self.num_hidden]
        cs = [jnp.zeros((b, h, w, n), self.dtype) for n in self.num_hidden]
        m = jnp.zeros((b, h, w, self.num_hidden[-1]), self.dtype)

        outs = []
        for step in range(t):   # static unroll: T is tiny (<= 27 frames)
            x = frames[:, step]
            for i, cell in enumerate(layers):
                inp = x if i == 0 else hs[i - 1]
                hs[i], cs[i], m = cell(inp, hs[i], cs[i], m)
            outs.append(head(hs[-1]))
        return jnp.stack(outs, axis=1)


class HRNetPredRNN(nn.Module):
    """HRNet heatmaps refined by PredRNN (reference predrnn.py:186-236)."""

    backbone: PoseHRNet
    num_hidden: Sequence[int] = (64, 64, 64, 64)
    num_joints: int = 21
    use_softmax: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False):
        b, t = frames.shape[:2]
        flat = frames.reshape(b * t, *frames.shape[2:])
        out = self.backbone(flat, train)
        hm = out.heatmaps.reshape(b, t, *out.heatmaps.shape[1:])
        refined = PredRNN(self.num_hidden, self.num_joints, dtype=self.dtype,
                          name="predrnn")(hm)
        pose2d = decode_heatmaps(refined.reshape(b * t, *refined.shape[2:]),
                                 False)
        return refined, hm, pose2d.reshape(b, t, self.num_joints, 2)


class HRNetEmbTCN(nn.Module):
    """HRNet embeddings -> dilated temporal convs -> centre-frame pose
    (reference hrnet_emb_model.py:186-236)."""

    backbone: PoseHRNet
    embedding_size: int = 512
    tcn_channels: int = 1024
    filter_widths: Sequence[int] = (3, 3)
    num_joints: int = 21
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False):
        """frames: (B, T, H, W, 3) -> (B, K, 2) centre-frame pose."""
        b, t = frames.shape[:2]
        flat = frames.reshape(b * t, *frames.shape[2:])
        out = self.backbone(flat, train)
        emb = jnp.mean(out.features.astype(jnp.float32), axis=(1, 2))  # GAP
        emb = nn.Dense(self.embedding_size, dtype=self.dtype,
                       param_dtype=jnp.float32, name="embed")(emb)
        x = emb.reshape(b, t, self.embedding_size)

        dilation = 1
        for i, fw in enumerate(self.filter_widths):
            span = dilation * (fw - 1)
            if x.shape[1] <= span:
                break
            y = nn.Conv(self.tcn_channels, (fw,), kernel_dilation=(dilation,),
                        padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"tcn{i}")(x)
            y = nn.relu(nn.LayerNorm(dtype=jnp.float32, name=f"tcn_ln{i}")(y))
            x = y
            dilation *= fw
        x = jnp.mean(x, axis=1)
        uv = nn.Dense(self.num_joints * 2, dtype=self.dtype,
                      param_dtype=jnp.float32, name="head")(x)
        return uv.reshape(b, self.num_joints, 2)
