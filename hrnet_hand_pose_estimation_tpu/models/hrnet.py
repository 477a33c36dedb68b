"""HRNet backbone + pose heads, TPU-native (Flax, NHWC).

Re-design of the reference HRNet family:
- backbone topology:          lib/models/pose_hrnet.py:275-528
- spatial-softmax head:       lib/models/pose_hrnet_softmax.py:355,520-528
- volumetric variant (+GAP confidence heads): lib/models/pose_hrnet_volumetric.py:22-57,562-634

The multi-branch exchange unit keeps every branch as a separate NHWC tensor
(no ragged containers), fuse-upsampling is nearest x2^k (broadcast reshape),
the head's 4-branch concat + bilinear align-corners resize is expressed with
einsum interpolation matrices (ops/upsample.py) so everything tiles onto the
MXU.  All shapes are static; the whole forward jits to a single XLA program.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import spatial_softmax
from ..ops.upsample import upsample_bilinear_align_corners, upsample_nearest
from .layers import BLOCK_EXPANSION, BN_EPS, BN_MOMENTUM, ConvBN, ResLayer, conv_init

Dtype = Any


class StageCfg(NamedTuple):
    """Static description of one HRNet stage (MODEL.EXTRA.STAGEn in configs)."""

    num_modules: int
    num_branches: int
    block: str
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]

    @classmethod
    def from_cfg(cls, node) -> "StageCfg":
        return cls(
            num_modules=int(node["NUM_MODULES"]),
            num_branches=int(node["NUM_BRANCHES"]),
            block=str(node["BLOCK"]),
            num_blocks=tuple(int(b) for b in node["NUM_BLOCKS"]),
            num_channels=tuple(int(c) for c in node["NUM_CHANNELS"]),
        )

    @property
    def out_channels(self) -> Tuple[int, ...]:
        exp = BLOCK_EXPANSION[self.block]
        return tuple(c * exp for c in self.num_channels)


def _pallas_basic_branch_apply(variables, x: jax.Array, branch: str,
                               n_blocks: int) -> jax.Array:
    """Run a BasicBlock branch chain through the fused Pallas kernel with
    BN folded inline (eval semantics, exact)."""
    from ..models.layers import BN_EPS
    from ..ops.pallas.fused_bottleneck import fused_basic_chain

    params = variables["params"][branch]
    stats = variables["batch_stats"][branch]
    flat = []
    for bidx in range(n_blocks):
        blk_p, blk_s = params[f"block{bidx}"], stats[f"block{bidx}"]
        for cb in ("cb1", "cb2"):
            inv = blk_p[cb]["bn"]["scale"] / jnp.sqrt(blk_s[cb]["bn"]["var"] + BN_EPS)
            flat.append((blk_p[cb]["conv"]["kernel"] * inv).astype(jnp.bfloat16))
            flat.append((blk_p[cb]["bn"]["bias"]
                         - blk_s[cb]["bn"]["mean"] * inv).astype(jnp.float32))
    out = fused_basic_chain(x.astype(jnp.bfloat16), tuple(flat), n_blocks)
    return out.astype(x.dtype)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch residual blocks + exchange fusion
    (reference pose_hrnet.py:101-266)."""

    stage: StageCfg
    in_channels: Tuple[int, ...]
    multi_scale_output: bool = True
    dtype: Dtype = jnp.bfloat16
    pallas_branches: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        s = self.stage
        out_ch = s.out_channels
        # branches (reference :139-185).  Eval can run each BASIC chain as a
        # fused Pallas kernel (intermediates stay in VMEM; see PERF.md); the
        # chains are plain (stride-1, channel-preserving) so in==out.
        use_pallas = (self.pallas_branches and not train
                      and not self.is_initializing() and s.block == "BASIC")
        ys = []
        for i in range(s.num_branches):
            if use_pallas and self.in_channels[i] == out_ch[i]:
                ys.append(_pallas_basic_branch_apply(
                    self.variables, xs[i], f"branch{i}", s.num_blocks[i]))
                continue
            ys.append(
                ResLayer(s.block, s.num_channels[i], s.num_blocks[i],
                         self.in_channels[i], dtype=self.dtype, name=f"branch{i}")(xs[i], train)
            )
        if s.num_branches == 1:
            return [ys[0]]

        # exchange fusion (reference :187-266): for each output scale i, sum
        # contributions from every branch j then ReLU.
        n_out = s.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(s.num_branches):
                if j == i:
                    contrib = ys[j]
                elif j > i:
                    # 1x1 conv + BN, nearest-upsample 2^(j-i) (reference :198-208)
                    contrib = ConvBN(out_ch[i], 1, 1, relu=False, dtype=self.dtype,
                                     name=f"fuse{i}_{j}")(ys[j], train)
                    contrib = upsample_nearest(contrib, 2 ** (j - i))
                else:
                    # chain of stride-2 3x3 convs (reference :212-239); ReLU on
                    # all but the last link
                    contrib = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = out_ch[i] if last else out_ch[j]
                        contrib = ConvBN(ch, 3, 2, relu=not last, dtype=self.dtype,
                                         name=f"fuse{i}_{j}_{k}")(contrib, train)
                acc = contrib if acc is None else acc + contrib
            fused.append(nn.relu(acc))
        return fused


def _pallas_layer1_apply(variables, x: jax.Array) -> jax.Array:
    """Run layer1 through the fused Pallas bottleneck chain, folding BN into
    the conv weights inline (eval semantics; exact — see utils/fold_bn.py)."""
    from ..models.layers import BN_EPS
    from ..ops.pallas.fused_bottleneck import fused_bottleneck_chain

    params = variables["params"]["layer1"]
    stats = variables["batch_stats"]["layer1"]

    def folded(cb_p, cb_s):
        inv = cb_p["bn"]["scale"] / jnp.sqrt(cb_s["bn"]["var"] + BN_EPS)
        kernel = cb_p["conv"]["kernel"] * inv
        bias = cb_p["bn"]["bias"] - cb_s["bn"]["mean"] * inv
        return kernel, bias

    flat = []
    flags = []
    for bidx in range(4):
        blk_p, blk_s = params[f"block{bidx}"], stats[f"block{bidx}"]
        k1, b1 = folded(blk_p["cb1"], blk_s["cb1"])
        k2, b2 = folded(blk_p["cb2"], blk_s["cb2"])
        k3, b3 = folded(blk_p["cb3"], blk_s["cb3"])
        flat += [k1[0, 0].astype(jnp.bfloat16), b1.astype(jnp.float32),
                 k2.astype(jnp.bfloat16), b2.astype(jnp.float32),
                 k3[0, 0].astype(jnp.bfloat16), b3.astype(jnp.float32)]
        if "downsample" in blk_p:
            ks, bs = folded(blk_p["downsample"], blk_s["downsample"])
            flat += [ks[0, 0].astype(jnp.bfloat16), bs.astype(jnp.float32)]
            flags.append(True)
        else:
            flags.append(False)
    out = fused_bottleneck_chain(x.astype(jnp.bfloat16), tuple(flat),
                                 tuple(flags), out_channels=256)
    return out.astype(x.dtype)


class HRNetBackbone(nn.Module):
    """Stem + stage1 bottleneck layer + stages 2-4 (reference :283-488)."""

    stage2: StageCfg
    stage3: StageCfg
    stage4: StageCfg
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    pallas_layer1: bool = False
    pallas_branches: bool = False
    skip_stem: bool = False
    skip_layer1: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Sequence[jax.Array]:
        x = x.astype(self.dtype)
        # stem: two stride-2 3x3 convs -> 1/4 resolution (reference :285-291).
        # skip_stem lets the serving fast path (core/fast_infer.py) replace the
        # stem with an exact space-to-depth rewrite and feed the 1/4-res tensor
        # directly; the stem params still exist in the tree (flax ignores
        # unrequested subtrees at apply time).  skip_layer1 additionally skips
        # the bottleneck chain (the fused stem+layer1 Pallas kernel feeds the
        # 64x64x256 tensor straight in).
        if not (self.skip_stem or self.skip_layer1) or self.is_initializing():
            x = ConvBN(64, 3, 2, relu=True, dtype=self.dtype, name="stem1")(x, train)
            x = ConvBN(64, 3, 2, relu=True, dtype=self.dtype, name="stem2")(x, train)
        # layer1: 4 bottlenecks -> 256ch (reference :292).  Inference can run
        # the whole chain as one Pallas kernel with VMEM-resident
        # intermediates (PERF.md: 4.2 vs 5.7 ms at B=128) — parameters stay
        # identical; BN folds into the kernel weights on the fly.
        if self.skip_layer1 and not self.is_initializing():
            pass
        elif self.pallas_layer1 and not train and not self.is_initializing():
            x = _pallas_layer1_apply(self.variables, x)
        else:
            x = ResLayer("BOTTLENECK", 64, 4, 64, dtype=self.dtype, name="layer1")(x, train)

        mod_cls = nn.remat(HRModule, static_argnums=(2,)) if self.remat else HRModule

        def transition(xs, pre_ch, stage: StageCfg, name: str):
            """Add/convert branches between stages (reference :357-396).

            Matches the reference exactly: existing branches get a 3x3 ConvBNReLU
            only when channel counts differ; each new branch is a stride-2 3x3
            ConvBNReLU chain reading the previous stage's coarsest branch.
            """
            outs = []
            out_ch = stage.out_channels
            for i in range(stage.num_branches):
                if i < len(pre_ch):
                    if out_ch[i] != pre_ch[i]:
                        outs.append(ConvBN(out_ch[i], 3, 1, relu=True, dtype=self.dtype,
                                           name=f"{name}_{i}")(xs[i], train))
                    else:
                        outs.append(xs[i])
                else:
                    y = xs[-1]
                    for j in range(i + 1 - len(pre_ch)):
                        ch = out_ch[i] if j == i - len(pre_ch) else pre_ch[-1]
                        y = ConvBN(ch, 3, 2, relu=True, dtype=self.dtype,
                                   name=f"{name}_{i}_{j}")(y, train)
                    outs.append(y)
            return outs

        ch = (256,)
        xs = transition([x], ch, self.stage2, "transition1")
        for m in range(self.stage2.num_modules):
            xs = mod_cls(self.stage2, self.stage2.out_channels, True,
                         dtype=self.dtype, pallas_branches=self.pallas_branches,
                         name=f"stage2_m{m}")(xs, train)
        ch = self.stage2.out_channels

        xs = transition(xs, ch, self.stage3, "transition2")
        for m in range(self.stage3.num_modules):
            xs = mod_cls(self.stage3, self.stage3.out_channels, True,
                         dtype=self.dtype, pallas_branches=self.pallas_branches,
                         name=f"stage3_m{m}")(xs, train)
        ch = self.stage3.out_channels

        xs = transition(xs, ch, self.stage4, "transition3")
        for m in range(self.stage4.num_modules):
            xs = mod_cls(self.stage4, self.stage4.out_channels, True,
                         dtype=self.dtype, pallas_branches=self.pallas_branches,
                         name=f"stage4_m{m}")(xs, train)
        return xs


class HRNetOutput(NamedTuple):
    """Forward outputs; mirrors the reference model return tuples.

    - heatmaps: (B, H, W, K) — probabilities for softmax heads, raw logits
      for the plain head (reference pose_hrnet.py:568 vs _softmax.py:528)
    - features: (B, H, W, 480) concat of upsampled branches (inter_feat)
    - temperature: scalar softmax temperature (softmax heads) or None
    - confidences: (B, N) per-joint confidences (volumetric variant) or None
    """

    heatmaps: jax.Array
    features: jax.Array
    temperature: Optional[jax.Array] = None
    confidences: Optional[jax.Array] = None


class GlobalAveragePoolingHead(nn.Module):
    """Confidence head of the volumetric backbone
    (reference pose_hrnet_volumetric.py:22-57): two Conv+BN -> maxpool -> ReLU
    blocks, global average pool, then a 512-256-n MLP with sigmoid output."""

    out_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(512, 3, 1, relu=False, use_bias=True, dtype=self.dtype, name="cb1")(x, train)
        x = nn.relu(nn.max_pool(x, (2, 2), strides=(2, 2)))
        x = ConvBN(256, 3, 1, relu=False, use_bias=True, dtype=self.dtype, name="cb2")(x, train)
        x = nn.relu(nn.max_pool(x, (2, 2), strides=(2, 2)))
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = nn.relu(nn.Dense(512, dtype=jnp.float32, name="fc1")(x))
        x = nn.relu(nn.Dense(256, dtype=jnp.float32, name="fc2")(x))
        x = nn.Dense(self.out_features, dtype=jnp.float32, name="fc3")(x)
        return jax.nn.sigmoid(x)


class _ConvParams(nn.Module):
    """Bare conv parameters matching nn.Conv's tree ({kernel, bias})."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_init(),
                            (1, 1, self.in_features, self.out_features))
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return kernel, bias


class FusedHead(nn.Module):
    """Concat-free HRNet head (see PoseHRNet.fused_head).

    Parameter tree is identical to ``ConvBN(480, 1, use_bias=True)``:
    {conv: {kernel, bias}, bn: {scale, bias}} (+ batch_stats bn), so the
    standard and fused paths load the same checkpoints.
    """

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], out_hw, train: bool = False):
        # the reference last_layer maps total_in -> total_in channels
        # (pose_hrnet.py:333-341, last_inp_channels on both sides)
        total_in = sum(t.shape[-1] for t in xs)
        kernel, bias = _ConvParams(total_in, total_in, name="conv")()
        acc = None
        offset = 0
        for t in xs:
            ci = t.shape[-1]
            w_i = kernel[:, :, offset:offset + ci, :].astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                t.astype(self.dtype), w_i, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    t.shape, w_i.shape, ("NHWC", "HWIO", "NHWC")))
            y = upsample_bilinear_align_corners(y, out_hw)
            acc = y if acc is None else acc + y
            offset += ci
        acc = acc + bias.astype(self.dtype)
        from .layers import BN_EPS, BN_MOMENTUM

        acc = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=BN_EPS, dtype=self.dtype,
                           param_dtype=jnp.float32, name="bn")(acc)
        return nn.relu(acc)


class PoseHRNet(nn.Module):
    """HRNet + heatmap head.

    ``head``:
      - 'plain':   raw heatmap logits (reference pose_hrnet.py)
      - 'softmax': spatial softmax with (optionally trainable) temperature
                   (reference pose_hrnet_softmax.py, pose_hrnet_volumetric.py)
    """

    stage2: StageCfg
    stage3: StageCfg
    stage4: StageCfg
    num_joints: int = 21
    head: str = "softmax"
    trainable_softmax: bool = False
    final_conv_kernel: int = 1
    vol_confidences: bool = False
    alg_confidences: bool = False
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    fused_head: bool = False
    pallas_layer1: bool = False
    pallas_branches: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> HRNetOutput:
        xs = HRNetBackbone(self.stage2, self.stage3, self.stage4,
                           dtype=self.dtype, remat=self.remat,
                           pallas_layer1=self.pallas_layer1,
                           pallas_branches=self.pallas_branches,
                           name="backbone")(x, train)

        h, w = xs[0].shape[1:3]
        use_fused = (self.fused_head and not train
                     and not (self.vol_confidences or self.alg_confidences))

        if use_fused:
            # Inference fast path, mathematically identical to the reference
            # head: a 1x1 conv distributes over channel concat and commutes
            # with (linear) bilinear upsampling, so instead of materialising
            # the 480ch full-res concat (the single biggest HBM tensor of the
            # whole forward) we conv each branch AT ITS NATIVE RESOLUTION
            # with the matching kernel slice, upsample the 480ch results and
            # sum — ~8x fewer head-conv FLOPs and no concat traffic.  Owns
            # the SAME head_cb parameter tree, so checkpoints are
            # interchangeable with the standard path.
            features = xs[0]  # fused path does not materialise the concat
            y = FusedHead(dtype=self.dtype, name="head_cb")(xs, (h, w), train)
        else:
            # head: bilinear(align_corners) upsample branches 1..3 to 1/4 res
            # and concat -> 480ch features (reference pose_hrnet.py:499-506)
            feats = [xs[0]] + [upsample_bilinear_align_corners(t, (h, w)) for t in xs[1:]]
            features = jnp.concatenate(feats, axis=-1)

        confidences = None
        if self.vol_confidences or self.alg_confidences:
            confidences = GlobalAveragePoolingHead(
                self.num_joints if self.alg_confidences else 32,
                dtype=self.dtype, name="confidence_head")(features, train)

        if not use_fused:
            # last_layer: 1x1 conv + BN + ReLU + final conv (reference
            # :335-350); the reference head convs carry biases.
            y = ConvBN(features.shape[-1], 1, 1, relu=True, use_bias=True,
                       dtype=self.dtype, name="head_cb")(features, train)
        pad = 1 if self.final_conv_kernel == 3 else 0
        y = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                    padding=((pad, pad), (pad, pad)),
                    kernel_init=conv_init(), dtype=self.dtype,
                    param_dtype=jnp.float32, name="final_conv")(y)

        if self.head == "plain":
            return HRNetOutput(y.astype(jnp.float32), features, None, confidences)

        # spatial softmax with trainable temperature (reference _softmax.py:355,520-528)
        temp = self.param("trainable_temp", nn.initializers.ones, ())
        if not self.trainable_softmax:
            temp = jax.lax.stop_gradient(temp)
        probs = spatial_softmax(y, temp)
        return HRNetOutput(probs, features, temp, confidences)


def hrnet_from_cfg(cfg, head: str = "softmax", **overrides) -> PoseHRNet:
    """Build a PoseHRNet from a loaded config (MODEL.EXTRA.STAGE2/3/4)."""
    extra = cfg.MODEL.EXTRA
    compute_dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE) if "TPU" in cfg else jnp.bfloat16
    kwargs = dict(
        stage2=StageCfg.from_cfg(extra["STAGE2"]),
        stage3=StageCfg.from_cfg(extra["STAGE3"]),
        stage4=StageCfg.from_cfg(extra["STAGE4"]),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        head=head,
        trainable_softmax=bool(cfg.MODEL.TRAINABLE_SOFTMAX),
        final_conv_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
        dtype=compute_dtype,
        remat=bool(cfg.TPU.REMAT) if "TPU" in cfg else False,
    )
    kwargs.update(overrides)
    return PoseHRNet(**kwargs)
