"""Inference fast path: folded forward with the fused Pallas decoder.

`folded_forward` reproduces `R2Plus1DMotionSegNet(folded=True).apply(...)`
— backbone, same-resolution-merged tap projections, decoder, heads — but
lets the decoder tail run as one fused Pallas kernel
(ops/pallas/decoder_kernel.py) instead of ~10 full-resolution XLA passes.
The XLA variant (`pallas=False`) is bit-identical to the flax model (a
parity test pins this) and serves as the CPU/fallback path; the Pallas
variant differs only by matmul fp reordering.

Used by `VideoSegmenter` (single-device TPU engines); training and any
unfolded use keep the flax module. Reference decoder semantics:
R2plus1D_18_MotionNet.py:41-69.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from echoflow.models.r2plus1d import R2Plus1DBackbone
from echoflow.ops.resize import trilinear_resize

_TAP_CHANNELS = (64, 64, 128, 256, 512)


def merged_projections(taps, comb1_kernel, dtype=jnp.float32):
    """Project each backbone tap with its slice of the (1024 -> 64) comb1
    kernel and sum projections that share a resolution (exact: upsampling
    is linear). Returns projections ordered by first appearance."""
    projs: dict = {}
    offset = 0
    for tap, ch in zip(taps, _TAP_CHANNELS):
        w_slice = comb1_kernel[0, 0, 0, offset:offset + ch, :].astype(dtype)
        proj = jnp.einsum("nthwc,cd->nthwd", tap, w_slice)
        shape = tap.shape[1:4]
        projs[shape] = proj if shape not in projs else projs[shape] + proj
        offset += ch
    return list(projs.values())


def folded_forward(variables, video, *, dtype=jnp.float32, backbone_dtype=None,
                   pallas=True, with_motion=True, train=False):
    """video (N, 3, T, H, W) -> (seg (N, 2, T, H, W), motion (N, 4, T, H, W)
    or None). `variables` must be folded (fold_bn.fold_variables).

    `backbone_dtype` (default: same as `dtype`) sets the compute dtype of
    the conv backbone only — the selective mixed-precision policy runs the
    backbone (~55% of forward FLOPs, all conv/MXU work) in bf16 while the
    decoder einsums + heads, where argmax-deciding logit margins are
    formed, stay fp32. Params stay fp32 either way."""
    assert not train, "folded_forward is inference-only"
    p = variables["params"]
    n, c, t, h, w = video.shape
    bdt = dtype if backbone_dtype is None else backbone_dtype
    x = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(bdt)

    taps = R2Plus1DBackbone(bdt, folded=True).apply(
        {"params": p["backbone"]}, x, train=False)
    taps = [tp.astype(dtype) for tp in taps]
    projs = merged_projections(taps, p["comb1_kernel"], dtype)
    # The kernel upsamples H/W; the (cheap, low-spatial-res) T resize stays
    # in XLA. align_corners=True everywhere (reference decoder convention).
    projs = [trilinear_resize(pr, (t,) + pr.shape[2:4], align_corners=True,
                              axes=(1, 2, 3)) for pr in projs]

    args = (
        p["comb1_bias"],
        p["comb2"]["kernel"][0, 0, 0], p["comb2"]["bias"],
        p["seg_head"]["kernel"][0, 0, 0], p["seg_head"]["bias"],
        p["motion_head"]["kernel"][0, 0, 0], p["motion_head"]["bias"],
    )
    if pallas:
        from echoflow.ops.pallas.decoder_kernel import fused_decoder_heads

        seg, mot = fused_decoder_heads(
            [pr.astype(jnp.float32) for pr in projs], *[jnp.asarray(a, jnp.float32) for a in args],
            out_hw=(h, w), with_motion=with_motion)
    else:
        seg, mot = _xla_decoder(projs, *args, out_hw=(h, w), dtype=dtype)

    seg = jnp.transpose(seg, (0, 4, 1, 2, 3)).astype(jnp.float32)
    if mot is None:
        return seg, None
    return seg, jnp.transpose(mot, (0, 4, 1, 2, 3)).astype(jnp.float32)


def _xla_decoder(projs, b1, w2, b2, ws, bs, wm, bm, out_hw, dtype):
    """The flax model's decoder, verbatim math (parity-pinned): T/H resize
    per group at native width, then ONE W-contraction over the
    concatenated groups (see models/r2plus1d.py for the block-matrix
    identity and the bandwidth rationale)."""
    from echoflow.ops.resize import linear_resize_matrix, resize_linear

    h, w = out_hw
    t = projs[0].shape[1]
    ints, mats = [], []
    for pr in projs:
        pr = resize_linear(pr, 1, t, align_corners=True)
        pr = resize_linear(pr, 3, w, align_corners=True)
        ints.append(pr)
        mats.append(linear_resize_matrix(pr.shape[2], h, True))
    if len(ints) == 1:
        acc = resize_linear(ints[0], 2, h, align_corners=True)
    else:
        cat = jnp.concatenate(ints, axis=2)
        hcat = jnp.concatenate(mats, axis=1)
        acc = jnp.einsum("ntswc,hs->nthwc", cat, hcat.astype(dtype),
                         precision="highest")
    y = acc + b1.astype(dtype)
    y = jnp.maximum(y, 0.0)
    y = jnp.einsum("...c,cd->...d", y, w2.astype(dtype)) + b2.astype(dtype)
    y = jnp.maximum(y, 0.0)
    seg = jnp.einsum("...c,cd->...d", y, ws.astype(dtype)) + bs.astype(dtype)
    mot = jnp.tanh(jnp.einsum("...c,cd->...d", y, wm.astype(dtype)) + bm.astype(dtype))
    return seg, mot
