"""R(2+1)D-18 MotionNet: joint segmentation + bidirectional motion heads.

A from-scratch flax implementation of the reference architecture
(src/model/R2plus1D_18_MotionNet.py:10-71): a torchvision-topology
r2plus1d_18 video backbone whose stem/layer1..4 feature maps are upsampled
to input resolution (trilinear, align_corners=True), concatenated (1024 ch),
passed through two 1x1x1 conv+BN+ReLU combine blocks (1024->64->64), and
split into a 2-channel segmentation head and a tanh-bounded 4-channel motion
head (forward x,y / backward x,y), the motion kernel initialized
N(0, sqrt(1e-5)).

Topology notes (verified against the 31,575,731 reference param count):
  - stem: 3 -> 45 (1x7x7, stride 1,2,2) -> BN -> ReLU -> 45 -> 64
    (3x1x1) -> BN -> ReLU.
  - each BasicBlock factors every 3x3x3 conv into spatial (1x3x3) +
    BN + ReLU + temporal (3x1x1) with
    midplanes = (in*out*27) // (in*9 + 3*out), computed once per block from
    (in, out) and shared by both convs (torchvision semantics).
  - stage plan 64,128,256,512 with 2 blocks each; stride-2 stages downsample
    via a 1x1x1 stride-(2,2,2) conv + BN residual projection.
  - the reference wraps the *entire* torchvision model, so its reported
    parameter count includes the unused 400-way Kinetics fc head
    (512*400+400 = 205,200). We carry those parameters in the pytree (never
    used in forward) so checkpoints and param counts match exactly.

TPU-first design choices:
  - channels-last (N, T, H, W, C) internally; the public interface keeps the
    reference's (N, C, T, H, W) contract.
  - the decoder never materializes the (N, 32, 112, 112, 1024) concat:
    1x1x1 convolution and trilinear upsampling are both linear maps, so
    comb1(concat_i(up(f_i))) == sum_i up(f_i @ W_i) + b. Each tap is
    projected to 64 channels at its native (low) resolution and upsampled
    afterwards — identical math (up to fp reordering), ~16x less decoder
    bandwidth. The weight is still stored as one (1,1,1,1024,64) kernel for
    checkpoint parity and split at apply time.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from echoflow.ops.resize import trilinear_resize

# (in, out, 3*3*3) // (in*3*3 + 3*out): torchvision's (2+1)D midplanes rule.
def midplanes(in_ch: int, out_ch: int) -> int:
    return (in_ch * out_ch * 3 * 3 * 3) // (in_ch * 3 * 3 + 3 * out_ch)


_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class Conv2Plus1D(nn.Module):
    """Factored (2+1)D convolution: spatial (1,3,3) -> BN -> ReLU ->
    temporal (3,1,1). No biases (torchvision). With `folded=True` the BNs
    are absorbed into biased convs (see models/fold_bn.py)."""

    out_ch: int
    mid_ch: int
    stride: int = 1
    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        s = self.stride
        x = nn.Conv(
            self.mid_ch, (1, 3, 3), strides=(1, s, s),
            padding=[(0, 0), (1, 1), (1, 1)], use_bias=self.folded,
            kernel_init=_KAIMING, dtype=self.dtype, name="spatial",
        )(x)
        if not self.folded:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn_mid",
            )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_ch, (3, 1, 1), strides=(s, 1, 1),
            padding=[(1, 1), (0, 0), (0, 0)], use_bias=self.folded,
            kernel_init=_KAIMING, dtype=self.dtype, name="temporal",
        )(x)
        return x


class BasicBlock(nn.Module):
    """Residual block of two (2+1)D convs (torchvision VideoResNet
    BasicBlock with the Conv2Plus1D builder)."""

    in_ch: int
    out_ch: int
    stride: int = 1
    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        mid = midplanes(self.in_ch, self.out_ch)
        identity = x

        y = Conv2Plus1D(self.out_ch, mid, self.stride, self.dtype,
                        self.folded, name="conv1")(x, train)
        if not self.folded:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Conv2Plus1D(self.out_ch, mid, 1, self.dtype,
                        self.folded, name="conv2")(y, train)
        if not self.folded:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn2")(y)

        if self.stride != 1 or self.in_ch != self.out_ch:
            s = self.stride
            identity = nn.Conv(
                self.out_ch, (1, 1, 1), strides=(s, s, s), use_bias=self.folded,
                kernel_init=_KAIMING, dtype=self.dtype, name="down_conv",
            )(identity)
            if not self.folded:
                identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                        epsilon=1e-5, dtype=self.dtype, name="down_bn")(identity)

        return nn.relu(y + identity)


class R2Plus1DBackbone(nn.Module):
    """Stem + 4 stages; returns the five tap feature maps."""

    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        # Stem: (1,7,7) stride (1,2,2) 3->45, BN, ReLU; (3,1,1) 45->64, BN, ReLU.
        x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                    padding=[(0, 0), (3, 3), (3, 3)], use_bias=self.folded,
                    kernel_init=_KAIMING, dtype=self.dtype, name="stem_conv_s")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="stem_bn_s")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 1, 1), strides=(1, 1, 1),
                    padding=[(1, 1), (0, 0), (0, 0)], use_bias=self.folded,
                    kernel_init=_KAIMING, dtype=self.dtype, name="stem_conv_t")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="stem_bn_t")(x)
        stem = nn.relu(x)

        taps = [stem]
        x = stem
        plan = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, cout, stride) in enumerate(plan, start=1):
            x = BasicBlock(cin, cout, stride, self.dtype, self.folded,
                           name=f"layer{i}_block0")(x, train)
            x = BasicBlock(cout, cout, 1, self.dtype, self.folded,
                           name=f"layer{i}_block1")(x, train)
            taps.append(x)
        return taps


class R2Plus1DMotionSegNet(nn.Module):
    """Full MotionNet. Public contract matches the reference:

        (seg_logits, motion) = model.apply(vars, video, train=...)
        video: (N, 3, T, H, W) float; seg: (N, 2, T, H, W);
        motion: (N, 4, T, H, W) tanh-bounded.

    Set `dtype=jnp.bfloat16` for the fast path (params stay fp32).
    """

    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, video, train: bool = False):
        n, c, t, h, w = video.shape
        x = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(self.dtype)  # NTHWC

        taps = R2Plus1DBackbone(self.dtype, self.folded, name="backbone")(x, train)
        tap_channels = [64, 64, 128, 256, 512]

        # Combine block 1, decomposed: project each tap at native resolution
        # with its slice of the (1024 -> 64) kernel, upsample
        # (align_corners=True, reference R2plus1D_18_MotionNet.py:41-49),
        # and accumulate. Exactly comb1(concat(upsampled taps)).
        comb1_kernel = self.param(
            "comb1_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (1, 1, 1, 1024, 64), jnp.float32,
        )
        comb1_bias = self.param("comb1_bias", nn.initializers.zeros, (64,), jnp.float32)

        # Project every tap at native resolution, then sum same-resolution
        # projections BEFORE their (shared) upsample: up(a) + up(b) ==
        # up(a + b) exactly (linearity), and stem/layer1 share (T, 56, 56),
        # so the expensive 56->112 resize runs once instead of twice
        # (~15% off the whole forward on TPU).
        projs: dict = {}
        offset = 0
        for tap, ch in zip(taps, tap_channels):
            w_slice = comb1_kernel[0, 0, 0, offset:offset + ch, :].astype(self.dtype)
            proj = jnp.einsum("nthwc,cd->nthwd", tap, w_slice)
            shape = tap.shape[1:4]
            projs[shape] = proj if shape not in projs else projs[shape] + proj
            offset += ch
        # T- and W-resize each group at its NATIVE height, then concatenate
        # every group along the H axis and contract once with the stacked
        # H-resize matrices: sum_r Hm_r @ A_r == [Hm_1..Hm_n] @ [A_1;..;A_n]
        # (block-matrix identity, exact up to fp reordering). This removes
        # n-1 full-resolution materializations + the accumulation passes —
        # the decoder was HBM-bound on exactly that traffic — and the
        # single contraction dim (sum of native heights, 105 here) tiles
        # the 128-wide MXU far better than four 56/28/14/7-wide matmuls.
        # (W before H: the pre-concat intermediates then sit at native
        # height — ~30% smaller than the H-first form; measured ~6%
        # faster end-to-end.)
        from echoflow.ops.resize import linear_resize_matrix, resize_linear

        ints, mats = [], []
        for proj in projs.values():
            proj = resize_linear(proj, 1, t, align_corners=True)
            proj = resize_linear(proj, 3, w, align_corners=True)
            ints.append(proj)
            mats.append(linear_resize_matrix(proj.shape[2], h, True))
        if len(ints) == 1:
            acc = resize_linear(ints[0], 2, h, align_corners=True)
        else:
            cat = jnp.concatenate(ints, axis=2)
            hcat = jnp.concatenate(mats, axis=1)
            acc = jnp.einsum("ntswc,hs->nthwc", cat, hcat.astype(self.dtype),
                             precision="highest")
        y = acc + comb1_bias.astype(self.dtype)

        if not self.folded:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="comb_bn1")(y)
        y = nn.relu(y)

        y = nn.Conv(64, (1, 1, 1), use_bias=True, kernel_init=_KAIMING,
                    dtype=self.dtype, name="comb2")(y)
        if not self.folded:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="comb_bn2")(y)
        y = nn.relu(y)

        seg = nn.Conv(2, (1, 1, 1), use_bias=True, kernel_init=_KAIMING,
                      dtype=self.dtype, name="seg_head")(y)
        motion = nn.Conv(
            4, (1, 1, 1), use_bias=True,
            kernel_init=nn.initializers.normal(stddev=math.sqrt(1e-5)),
            dtype=self.dtype, name="motion_head",
        )(y)
        motion = jnp.tanh(motion)

        # Unused Kinetics-400 fc head, carried for checkpoint/count parity
        # with the reference's wrapped torchvision model (205,200 params).
        self.param("fc_kernel", nn.initializers.zeros, (512, 400), jnp.float32)
        self.param("fc_bias", nn.initializers.zeros, (400,), jnp.float32)

        seg = jnp.transpose(seg, (0, 4, 1, 2, 3)).astype(jnp.float32)
        motion = jnp.transpose(motion, (0, 4, 1, 2, 3)).astype(jnp.float32)
        return seg, motion


def create_model(dtype=jnp.float32) -> R2Plus1DMotionSegNet:
    return R2Plus1DMotionSegNet(dtype=dtype)


def init_variables(rng: jax.Array, model: R2Plus1DMotionSegNet,
                   input_shape=(1, 3, 32, 112, 112)):
    # jit the init: eager per-op dispatch over a remote TPU tunnel makes
    # unjitted init take minutes; jitted it is one executable.
    dummy = jnp.zeros(input_shape, jnp.float32)
    return jax.jit(model.init, static_argnames=("train",))(rng, dummy, train=False)


def param_count(variables) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
