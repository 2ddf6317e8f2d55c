"""zeroone normalization + one-hot parity tests."""

import numpy as np
import jax.numpy as jnp

from echoflow.ops.normalize import one_hot_channels, zeroone_normalize, zeroone_normalizer


def test_device_and_host_normalizers_agree(rng):
    video = (rng.rand(3, 20, 16, 16) * 255).astype(np.float32)
    host = zeroone_normalizer(video.copy())
    dev = np.asarray(zeroone_normalize(jnp.asarray(video)))
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)
    # Per-channel range is exactly [0, 1].
    for c in range(3):
        assert host[c].min() == 0.0 and host[c].max() == 1.0


def test_one_hot_channels(rng):
    lab = (rng.rand(2, 1, 5, 5) > 0.5).astype(np.int32)
    oh = np.asarray(one_hot_channels(jnp.asarray(lab), 2))
    assert oh.shape == (2, 2, 5, 5)
    np.testing.assert_array_equal(oh[:, 1], lab[:, 0].astype(np.float32))
    np.testing.assert_array_equal(oh.sum(axis=1), np.ones((2, 5, 5), np.float32))


def test_normalizer_handles_readonly_float_input(rng):
    """The CLI resize path hands the normalizer a numpy view of a jax array,
    which is read-only — the float path must copy instead of crashing its
    in-place ops (regression: `-p video --height H` with H != input size)."""
    video = (rng.rand(3, 8, 6, 6) * 255).astype(np.float32)
    ro = video.copy()
    ro.setflags(write=False)
    out = zeroone_normalizer(ro)
    np.testing.assert_allclose(out, zeroone_normalizer(video.copy()),
                               rtol=0, atol=0)
    # The read-only input itself is untouched.
    np.testing.assert_array_equal(ro, video)


def test_normalizer_uint8_matches_float_path(rng):
    """uint8 input (decoder output) routes through native (or its
    bit-identical fallback) and must agree with the float reference path."""
    video_u8 = (rng.rand(3, 8, 6, 6) * 255).astype(np.uint8)
    out = zeroone_normalizer(video_u8)
    ref = zeroone_normalizer(video_u8.astype(np.float32))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
