"""Separable linear / trilinear resize matching PyTorch `F.interpolate`.

The reference mixes *both* align_corners conventions (SURVEY.md §7.3):
  - align_corners=True : model decoder upsampling
    (reference src/model/R2plus1D_18_MotionNet.py:41-49), CLI input resize
    (motion_segment.py:100-104), dataset systole shrink
    (src/echonet_dataset.py:133-137).
  - align_corners=False: ragged-tail clip interpolation and softmax
    re-interpolation (src/fuse_utils.py:21-25, 74-77).

PyTorch's trilinear interpolation is separable, so we implement it as three
1-D linear resizes. Each 1-D resize is a dense (dst, src) weight matrix
applied with an einsum — this maps the whole op onto the MXU instead of
gathers, which is the idiomatic TPU formulation (a 112->224 resize becomes a
(224,112) x (112, N) matmul).

Coordinate conventions (must match torch bit-for-bit):
  align_corners=True : src = i * (src_len - 1) / (dst_len - 1)   (0 if dst_len == 1)
  align_corners=False: src = (i + 0.5) * src_len / dst_len - 0.5, clamped to
                       [0, src_len - 1] (torch clamps negatives to 0; the
                       upper end never exceeds src_len - 0.5 and the i0+1
                       corner index is clamped to src_len - 1, which the
                       [0, src_len-1] clamp reproduces exactly).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=512)
def _linear_resize_matrix_np(src_len: int, dst_len: int, align_corners: bool):
    if src_len == dst_len:
        return np.eye(dst_len, dtype=np.float32)
    # Coordinates in float32, exactly as torch's area_pixel_compute_source_index
    # computes them (scalar_t = float); float64 here would produce weights a
    # few ULPs away from torch's.
    i = np.arange(dst_len, dtype=np.float32)
    if align_corners:
        if dst_len == 1:
            coord = np.zeros_like(i)
        else:
            scale = np.float32(src_len - 1) / np.float32(dst_len - 1)
            coord = i * scale
    else:
        scale = np.float32(src_len) / np.float32(dst_len)
        coord = (i + np.float32(0.5)) * scale - np.float32(0.5)
    coord = np.clip(coord, np.float32(0.0), np.float32(src_len - 1))
    lo = np.floor(coord).astype(np.int64)
    hi = np.minimum(lo + 1, src_len - 1)
    w_hi = (coord - lo.astype(np.float32)).astype(np.float32)
    w_lo = np.float32(1.0) - w_hi
    mat = np.zeros((dst_len, src_len), dtype=np.float32)
    mat[np.arange(dst_len), lo] += w_lo
    mat[np.arange(dst_len), hi] += w_hi
    return mat


def linear_resize_matrix(src_len: int, dst_len: int, align_corners: bool) -> jnp.ndarray:
    """(dst_len, src_len) float32 interpolation matrix for one axis."""
    return jnp.asarray(_linear_resize_matrix_np(src_len, dst_len, bool(align_corners)))


def resize_linear(x: jnp.ndarray, axis: int, dst_len: int, align_corners: bool) -> jnp.ndarray:
    """Linearly resize `x` along `axis` to `dst_len` (torch semantics)."""
    axis = axis % x.ndim
    src_len = x.shape[axis]
    if src_len == dst_len:
        return x
    mat = linear_resize_matrix(src_len, dst_len, align_corners).astype(x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    # precision='highest': the interpolation weights must combine in full
    # fp32 — the default TPU matmul precision (bf16 inputs) costs ~1% error,
    # which breaks bit-parity with torch's interpolate.
    out = jnp.einsum("...s,ds->...d", moved, mat, precision="highest")
    return jnp.moveaxis(out, -1, axis)


def trilinear_resize(
    x: jnp.ndarray,
    size: tuple[int, int, int],
    align_corners: bool,
    axes: tuple[int, int, int] = (-3, -2, -1),
) -> jnp.ndarray:
    """Trilinear resize of the three `axes` of `x` to `size`.

    Equivalent to `F.interpolate(x, size=size, mode="trilinear",
    align_corners=align_corners)` on an (N, C, D, H, W) tensor with the
    default axes; works on any rank since interpolation is separable.
    """
    for axis, dst in zip(axes, size):
        x = resize_linear(x, axis, dst, align_corners)
    return x


def resize_video_frames(video: jnp.ndarray, num_frames: int, align_corners: bool) -> jnp.ndarray:
    """Resize the time axis of a (C, T, H, W) video (spatial dims untouched)."""
    return resize_linear(video, 1, num_frames, align_corners)
