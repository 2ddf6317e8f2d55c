"""Golden-value tests: bilinear border warp vs torch F.grid_sample using the
reference's generate_2dmotion_field grid convention
(reference src/transform_utils.py:14-34)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from echoflow.ops.warp import warp_image_with_offsets


def torch_reference_warp(image: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """The reference warp: build the grid exactly as generate_2dmotion_field
    does (minus .cuda()), then grid_sample with align_corners=False/border."""
    x = torch.from_numpy(image)
    off = torch.from_numpy(offsets)
    n, _, h, w = x.shape
    grid_w, grid_h = torch.meshgrid(
        [torch.linspace(-1, 1, h), torch.linspace(-1, 1, w)], indexing="ij"
    )
    offset_h, offset_w = torch.split(off, 1, 1)
    offset_w = offset_w.reshape(-1, h, w) + grid_w
    offset_h = offset_h.reshape(-1, h, w) + grid_h
    grid = torch.stack((offset_h, offset_w), 3)
    out = F.grid_sample(x, grid, align_corners=False, mode="bilinear", padding_mode="border")
    return out.numpy()


@pytest.mark.parametrize("shape", [(2, 3, 16, 16), (1, 2, 112, 112), (2, 1, 7, 13)])
@pytest.mark.parametrize("scale", [0.0, 0.05, 0.5, 1.5])
def test_warp_matches_grid_sample(shape, scale, rng):
    n, c, h, w = shape
    img = rng.randn(*shape).astype(np.float32)
    off = (scale * rng.randn(n, 2, h, w)).astype(np.float32)
    ours = np.asarray(warp_image_with_offsets(jnp.asarray(img), jnp.asarray(off)))
    theirs = torch_reference_warp(img, off)
    # atol 2e-4: base-grid linspace ULP differences vs torch, amplified by
    # the unnormalization (x W/2); pure coordinate rounding noise.
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_warp_gradients_match_torch(rng):
    """Backward parity: d(sum(warp))/d(image) and /d(offsets) vs torch."""
    img = rng.randn(1, 2, 9, 9).astype(np.float32)
    off = (0.3 * rng.randn(1, 2, 9, 9)).astype(np.float32)

    def loss_jax(i, o):
        return jnp.sum(warp_image_with_offsets(i, o) ** 2)

    gi, go = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(off))

    ti = torch.from_numpy(img).requires_grad_(True)
    to = torch.from_numpy(off).requires_grad_(True)
    n, _, h, w = img.shape
    grid_w, grid_h = torch.meshgrid(
        [torch.linspace(-1, 1, h), torch.linspace(-1, 1, w)], indexing="ij"
    )
    offset_h, offset_w = torch.split(to, 1, 1)
    grid = torch.stack((offset_h.reshape(-1, h, w) + grid_h, offset_w.reshape(-1, h, w) + grid_w), 3)
    out = F.grid_sample(ti, grid, align_corners=False, mode="bilinear", padding_mode="border")
    (out ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gi), ti.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(go), to.grad.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_warp_randomized_parity_sweep(rng):
    """Randomized fuzz vs the torch oracle: odd shapes, huge offsets
    (border-clamp saturation), tiny images, forward AND gradient parity.
    Image/offset CONTENT is random (seeded); the shape/scale grid is fixed
    to 6 cases chosen to cover every class — tiny, odd, and rectangular
    shapes crossed with all four offset scales (4.0 = fully clamped) —
    because each distinct shape is a fresh ~12 s CPU compile and a random
    10-case draw spent half its budget on redundant mid-size shapes."""
    cases = [
        (1, 1, 2, 3, 4.0),    # tiniest image, fully clamped
        (2, 4, 7, 5, 0.01),   # odd small, near-zero offsets
        (3, 2, 40, 33, 1.0),  # largest, batch 3, full-range offsets
        (1, 3, 17, 29, 0.3),  # odd rectangular, moderate offsets
        (2, 1, 5, 38, 4.0),   # extreme aspect ratio, fully clamped
        (1, 2, 23, 11, 1.0),  # odd rectangular, full-range offsets
    ]

    for n, c, h, w, scale in cases:
        img = rng.randn(n, c, h, w).astype(np.float32)
        off = (scale * rng.randn(n, 2, h, w)).astype(np.float32)
        ours = np.asarray(warp_image_with_offsets(jnp.asarray(img), jnp.asarray(off)))
        theirs = torch_reference_warp(img, off)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4,
                                   err_msg=f"fwd {(n, c, h, w, scale)}")

        def loss_jax(i, o):
            return jnp.sum(warp_image_with_offsets(i, o) ** 2)

        gi, go = jax.grad(loss_jax, argnums=(0, 1))(
            jnp.asarray(img), jnp.asarray(off))
        ti = torch.from_numpy(img).requires_grad_(True)
        to = torch.from_numpy(off).requires_grad_(True)
        grid_w, grid_h = torch.meshgrid(
            [torch.linspace(-1, 1, h), torch.linspace(-1, 1, w)], indexing="ij")
        offset_h, offset_w = torch.split(to, 1, 1)
        grid = torch.stack((offset_h.reshape(-1, h, w) + grid_h,
                            offset_w.reshape(-1, h, w) + grid_w), 3)
        out = F.grid_sample(ti, grid, align_corners=False, mode="bilinear",
                            padding_mode="border")
        (out ** 2).sum().backward()
        # Gradient magnitudes reach ~1e3 under the squared-sum loss at
        # scale 4; fp32 reassociation alone produces ~1e-3 absolute
        # differences (verified: max observed relative error ~1e-5).
        np.testing.assert_allclose(np.asarray(gi), ti.grad.numpy(),
                                   rtol=1e-3, atol=5e-3,
                                   err_msg=f"d/dimg {(n, c, h, w, scale)}")
        np.testing.assert_allclose(np.asarray(go), to.grad.numpy(),
                                   rtol=1e-3, atol=5e-3,
                                   err_msg=f"d/doff {(n, c, h, w, scale)}")
