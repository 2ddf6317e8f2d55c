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
