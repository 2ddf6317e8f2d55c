"""Warp-rollout propagation tests (+ nearest-mode warp parity vs torch)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from echoflow.infer.propagate import (
    apply_sequence_deformation,
    deform_forback,
    deform_images_forback,
)
from echoflow.ops.warp import warp_image_with_offsets


def test_nearest_mode_matches_torch(rng):
    n, c, h, w = 2, 1, 16, 16
    img = rng.randn(n, c, h, w).astype(np.float32)
    off = (0.3 * rng.randn(n, 2, h, w)).astype(np.float32)
    ours = np.asarray(warp_image_with_offsets(jnp.asarray(img), jnp.asarray(off),
                                              mode="nearest"))
    x = torch.from_numpy(img)
    o = torch.from_numpy(off)
    gw, gh = torch.meshgrid([torch.linspace(-1, 1, h), torch.linspace(-1, 1, w)],
                            indexing="ij")
    oh_, ow_ = torch.split(o, 1, 1)
    grid = torch.stack((oh_.reshape(-1, h, w) + gh, ow_.reshape(-1, h, w) + gw), 3)
    want = F.grid_sample(x, grid, align_corners=False, mode="nearest",
                         padding_mode="border").numpy()
    # Nearest is exact except where the coordinate sits within fp noise of a
    # .5 rounding boundary.
    assert (ours != want).mean() < 0.01


def test_sequence_deformation_chains(rng):
    n, t, h, w = 1, 6, 12, 12
    src = jnp.asarray(rng.rand(n, 2, h, w), jnp.float32)
    motion = jnp.asarray(0.05 * rng.randn(n, 4, t, h, w), jnp.float32)

    out = apply_sequence_deformation(src, motion, 0, t - 1, forward=True)
    manual = src
    for k in range(t - 1):
        manual = warp_image_with_offsets(manual, motion[:, :2, k])
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-6)

    out_b = apply_sequence_deformation(src, motion, t - 1, 0, forward=False)
    manual = src
    for k in range(t - 1, 0, -1):
        manual = warp_image_with_offsets(manual, motion[:, 2:, k])
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(manual), atol=1e-6)


def test_deform_forback_shapes_and_consistency(rng):
    n, t, h, w = 2, 5, 8, 8
    ed = jnp.asarray(rng.rand(n, 2, h, w), jnp.float32)
    es = jnp.asarray(rng.rand(n, 2, h, w), jnp.float32)
    motion = jnp.asarray(0.02 * rng.randn(n, 4, t, h, w), jnp.float32)
    fwd, bwd = deform_forback(ed, es, motion, mode="bilinear")
    assert fwd.shape == (t - 1, n, 2, h, w)
    assert bwd.shape == (t - 1, n, 2, h, w)
    # First forward step equals a single warp of ED by flow 0.
    one = warp_image_with_offsets(ed, motion[:, :2, 0])
    np.testing.assert_allclose(np.asarray(fwd[0]), np.asarray(one), atol=1e-6)


def test_deform_images_forback(rng):
    n, c, t, h, w = 1, 1, 5, 8, 8
    images = jnp.asarray(rng.rand(n, c, t, h, w), jnp.float32)
    motion = jnp.asarray(0.02 * rng.randn(n, 4, t, h, w), jnp.float32)
    fwd, bwd = deform_images_forback(images, motion)
    assert fwd.shape == (t - 1, n, c, h, w)
    assert bwd.shape == (t - 1, n, c, h, w)
    # forwards[i] warps the *real* frame i (single-step, not chained).
    one = warp_image_with_offsets(images[:, :, 2], motion[:, :2, 2])
    np.testing.assert_allclose(np.asarray(fwd[2]), np.asarray(one), atol=1e-6)
