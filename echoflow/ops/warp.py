"""Differentiable bilinear warp matching `F.grid_sample` + the reference's
`generate_2dmotion_field` convention.

Reference semantics being matched (bit-for-bit):
  - grid built from `torch.meshgrid([linspace(-1,1,H), linspace(-1,1,W)])`
    with the motion tensor split as `offset_h, offset_w = split(offset, 1, 1)`
    and stacked `(offset_h + col_grid, offset_w + row_grid)` — i.e. motion
    channel 0 displaces the *x / width* coordinate and channel 1 the
    *y / height* coordinate (reference src/transform_utils.py:14-34; the
    variable names there are swapped but the math resolves to this).
  - `F.grid_sample(img, grid, align_corners=False, mode='bilinear',
    padding_mode='border')` (reference src/clasfv_losses.py:45-48,87,101,
    113,127 and src/loss_functions.py:109-110,231,261).

Unnormalization with align_corners=False: px = ((gx + 1) * W - 1) / 2.
Border padding clamps the *coordinate* to [0, size-1] before taking the four
corners, which is what torch's `clip_coordinates` does; the i0+1 corner is
then clamped to size-1 (its weight is 0 whenever that clamp binds).

The gradient of the clamp is 0 outside the image, matching torch's
grid_sample backward for border mode.

Formulated as four flat gathers + a blend; XLA fuses the arithmetic, and the
gather lowers to dynamic-slice loads on TPU. A fused Pallas kernel lives in
echoflow.ops.pallas.warp_kernel and is used when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gather_hw(flat_img: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """flat_img (N, C, H*W), flat_idx (N, H*W) -> (N, C, H*W)."""
    return jnp.take_along_axis(flat_img, flat_idx[:, None, :], axis=2)


def warp_bilinear_border(image: jnp.ndarray, grid_x: jnp.ndarray, grid_y: jnp.ndarray) -> jnp.ndarray:
    """Sample `image` (N, C, H, W) at normalized coords (N, H, W) per axis.

    grid_x indexes the width axis, grid_y the height axis; both are in
    [-1, 1] normalized units (align_corners=False convention).
    """
    n, c, h, w = image.shape
    px = ((grid_x + 1.0) * w - 1.0) * 0.5
    py = ((grid_y + 1.0) * h - 1.0) * 0.5
    px = jnp.clip(px, 0.0, w - 1.0)
    py = jnp.clip(py, 0.0, h - 1.0)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0).astype(image.dtype)
    fy = (py - y0).astype(image.dtype)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = image.reshape(n, c, h * w)
    idx00 = (y0i * w + x0i).reshape(n, h * w)
    idx01 = (y0i * w + x1i).reshape(n, h * w)
    idx10 = (y1i * w + x0i).reshape(n, h * w)
    idx11 = (y1i * w + x1i).reshape(n, h * w)

    v00 = _gather_hw(flat, idx00).reshape(n, c, h, w)
    v01 = _gather_hw(flat, idx01).reshape(n, c, h, w)
    v10 = _gather_hw(flat, idx10).reshape(n, c, h, w)
    v11 = _gather_hw(flat, idx11).reshape(n, c, h, w)

    fx = fx[:, None]
    fy = fy[:, None]
    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    return top + (bot - top) * fy


def warp_nearest_border(image: jnp.ndarray, grid_x: jnp.ndarray, grid_y: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sampling (grid_sample mode='nearest' semantics:
    round-half-to-even of the unnormalized coordinate, border clamp)."""
    n, c, h, w = image.shape
    px = ((grid_x + 1.0) * w - 1.0) * 0.5
    py = ((grid_y + 1.0) * h - 1.0) * 0.5
    xi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
    flat = image.reshape(n, c, h * w)
    idx = (yi * w + xi).reshape(n, h * w)
    return _gather_hw(flat, idx).reshape(n, c, h, w)


# Selectable bilinear backend:
#   "pallas" — fused Pallas TPU kernel (one-hot weights built in VMEM, MXU
#              contractions; ~7x over the gather on training shapes)
#   "matmul" — pure-XLA MXU contraction formulation (~4x over gather)
#   "gather" — the 4-point take_along_axis path (reference formulation)
#   "auto"   — pallas on TPU when shapes allow (H % 8 == 0), matmul elsewhere
# All are bit-identical on forward (pallas/matmul pin full precision).
_WARP_BACKEND = "auto"


def set_warp_backend(name: str):
    global _WARP_BACKEND
    assert name in ("auto", "pallas", "matmul", "gather")
    _WARP_BACKEND = name


def _resolve_backend(h: int) -> str:
    if _WARP_BACKEND != "auto":
        return _WARP_BACKEND
    if h % 8 == 0 and jax.default_backend() not in ("cpu",):
        return "pallas"
    return "matmul"


def warp_image_with_offsets(image: jnp.ndarray, offsets: jnp.ndarray,
                            mode: str = "bilinear") -> jnp.ndarray:
    """Warp `image` (N, C, H, W) by a 2-channel motion field (N, 2, H, W).

    offsets[:, 0] displaces x (width), offsets[:, 1] displaces y (height),
    in normalized [-1, 1] units (the model's tanh-bounded motion output).
    Equivalent to the reference's
    `F.grid_sample(image, generate_2dmotion_field(image, offsets),
                   align_corners=False, mode=mode, padding_mode='border')`.
    """
    _, _, h, w = image.shape
    # Base grid computed in float64 then cast: minimizes ULP drift vs
    # torch.linspace (residual value error vs torch is < 1e-4 on 112x112,
    # pure coordinate rounding noise — masks/Dice/EF are unaffected).
    base_x = jnp.asarray(np.linspace(-1.0, 1.0, w), dtype=offsets.dtype)
    base_y = jnp.asarray(np.linspace(-1.0, 1.0, h), dtype=offsets.dtype)
    grid_x = base_x[None, None, :] + offsets[:, 0]
    grid_y = base_y[None, :, None] + offsets[:, 1]
    if mode == "nearest":
        return warp_nearest_border(image, grid_x, grid_y)
    backend = _resolve_backend(h)
    if backend == "pallas":
        from echoflow.ops.pallas.warp_kernel import warp_pallas_coords

        px = ((grid_x + 1.0) * w - 1.0) * 0.5
        py = ((grid_y + 1.0) * h - 1.0) * 0.5
        return warp_pallas_coords(image, px, py)
    if backend == "matmul":
        return warp_bilinear_border_matmul(image, grid_x, grid_y)
    return warp_bilinear_border(image, grid_x, grid_y)


warp_image_with_offsets_jit = jax.jit(warp_image_with_offsets)


def _bilinear_row_col_weights(px, py, h, w):
    """Factor the bilinear interpolation weights into per-pixel row and
    column weight vectors. For border-clamped coordinates the 2x2 corner
    weights are exactly (row weight r) x (col weight c) with
    r = (1-fy) one_hot(y0) + fy one_hot(y1), c likewise in x — so the warp
    is two dense contractions (MXU work) instead of a 4-point gather.

    px, py: (B, H, W) pixel coordinates already clamped to the image.
    Returns R (B, H, W, h), C (B, H, W, w), float32.
    """
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0)[..., None]
    fx = (px - x0)[..., None]
    y0i = y0.astype(jnp.int32)[..., None]
    x0i = x0.astype(jnp.int32)[..., None]

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, h), 3)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3)
    # y1 = min(y0+1, h-1): when the clamp binds, fy == 0 so the second
    # one-hot's weight vanishes — placing it anywhere is safe.
    r_mat = ((rows == y0i) * (1.0 - fy) + (rows == y0i + 1) * fy)
    c_mat = ((cols == x0i) * (1.0 - fx) + (cols == x0i + 1) * fx)
    return r_mat.astype(jnp.float32), c_mat.astype(jnp.float32)


def warp_bilinear_border_matmul(image: jnp.ndarray, grid_x: jnp.ndarray,
                                grid_y: jnp.ndarray, row_block: int = 16) -> jnp.ndarray:
    """MXU formulation of `warp_bilinear_border`. Mathematically identical
    (same clamping, same weights); numerically equal up to fp reassociation.

    TPU's element gather lowers to a near-scalar path (~1 GB/s effective);
    this version runs ~two dense contractions per output row-block:
        T[b, p, (c, s)] = sum_r R[b, p, r] * img[b, r, (c, s)]
        out[b, c, p]    = sum_s T[b, p, c, s] * C[b, p, s]
    Blocked over output rows to bound the (.., s) intermediate.
    """
    n, c, h, w = image.shape
    px = jnp.clip(((grid_x + 1.0) * w - 1.0) * 0.5, 0.0, w - 1.0)
    py = jnp.clip(((grid_y + 1.0) * h - 1.0) * 0.5, 0.0, h - 1.0)

    r_mat, c_mat = _bilinear_row_col_weights(px, py, h, w)  # (N,H,W,h/w)
    img_rows = jnp.transpose(image, (0, 2, 1, 3)).reshape(n, h, c * w)

    blocks = -(-h // row_block)
    pad_rows = blocks * row_block - h
    if pad_rows:
        r_mat = jnp.pad(r_mat, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
        c_mat = jnp.pad(c_mat, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
    r_blk = r_mat.reshape(n, blocks, row_block * w, h).transpose(1, 0, 2, 3)
    c_blk = c_mat.reshape(n, blocks, row_block * w, w).transpose(1, 0, 2, 3)

    img32 = img_rows.astype(jnp.float32)

    def one_block(args):
        r_b, c_b = args  # (N, P, h), (N, P, w)
        t = jnp.einsum("bpr,brk->bpk", r_b, img32,
                       precision="highest").reshape(n, row_block * w, c, w)
        return jnp.einsum("bpcs,bps->bcp", t, c_b, precision="highest")

    out = jax.lax.map(one_block, (r_blk, c_blk))  # (blocks, N, C, P)
    out = jnp.transpose(out, (1, 2, 0, 3)).reshape(n, c, blocks * row_block, w)
    return out[:, :, :h].astype(image.dtype)


def warp_image_with_offsets_fast(image: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """MXU-backed drop-in for `warp_image_with_offsets` (bilinear only)."""
    _, _, h, w = image.shape
    base_x = jnp.asarray(np.linspace(-1.0, 1.0, w), dtype=offsets.dtype)
    base_y = jnp.asarray(np.linspace(-1.0, 1.0, h), dtype=offsets.dtype)
    grid_x = base_x[None, None, :] + offsets[:, 0]
    grid_y = base_y[None, :, None] + offsets[:, 1]
    return warp_bilinear_border_matmul(image, grid_x, grid_y)
