"""Pallas warp kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echoflow.ops.pallas import warp_kernel
from echoflow.ops.warp import warp_bilinear_border, warp_image_with_offsets


@pytest.fixture(autouse=True)
def _interpret_mode():
    warp_kernel.set_interpret_mode(True)
    yield
    warp_kernel.set_interpret_mode(False)


def _ref_warp_coords(image, px, py):
    """Gather-backend warp taking pixel coordinates directly."""
    _, _, h, w = image.shape
    gx = (2.0 * px + 1.0) / w - 1.0
    gy = (2.0 * py + 1.0) / h - 1.0
    return warp_bilinear_border(image, gx, gy)


@pytest.mark.parametrize("n,c,h,w", [(1, 2, 16, 16), (2, 3, 8, 24)])
def test_forward_matches_gather(n, c, h, w, rng):
    img = jnp.asarray(rng.rand(n, c, h, w), jnp.float32)
    px = jnp.asarray(
        np.clip(rng.rand(n, h, w) * (w + 2) - 1.5, -2, w + 1), jnp.float32)
    py = jnp.asarray(
        np.clip(rng.rand(n, h, w) * (h + 2) - 1.5, -2, h + 1), jnp.float32)
    got = np.asarray(warp_kernel.warp_pallas_coords(img, px, py))
    want = np.asarray(_ref_warp_coords(img, px, py))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_vjp_matches_gather_autodiff(rng):
    n, c, h, w = 1, 2, 16, 16
    img = jnp.asarray(rng.rand(n, c, h, w), jnp.float32)
    off = jnp.asarray(0.2 * rng.randn(n, 2, h, w), jnp.float32)

    def loss_pallas(i, o):
        return jnp.sum(warp_kernel.warp_image_with_offsets_pallas(i, o) ** 2)

    from echoflow.ops import warp as warp_mod

    old = warp_mod._WARP_BACKEND
    warp_mod.set_warp_backend("gather")
    try:
        def loss_ref(i, o):
            return jnp.sum(warp_image_with_offsets(i, o) ** 2)

        gi_r, go_r = jax.grad(loss_ref, (0, 1))(img, off)
    finally:
        warp_mod.set_warp_backend(old)

    gi_p, go_p = jax.grad(loss_pallas, (0, 1))(img, off)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(go_p), np.asarray(go_r), rtol=1e-4, atol=1e-4)


def test_border_clamp_gradient_masked(rng):
    """Coordinates pushed far outside the image: output equals the border
    pixel and the coordinate gradient is exactly zero there."""
    n, c, h, w = 1, 1, 8, 8
    img = jnp.asarray(rng.rand(n, c, h, w), jnp.float32)
    px = jnp.full((n, h, w), w + 5.0, jnp.float32)
    py = jnp.full((n, h, w), -7.0, jnp.float32)
    out = np.asarray(warp_kernel.warp_pallas_coords(img, px, py))
    np.testing.assert_allclose(out, np.broadcast_to(
        np.asarray(img)[:, :, :1, -1:], out.shape), atol=1e-6)

    g = jax.grad(lambda p: jnp.sum(warp_kernel.warp_pallas_coords(img, p, py)))(px)
    np.testing.assert_array_equal(np.asarray(g), np.zeros_like(g))
