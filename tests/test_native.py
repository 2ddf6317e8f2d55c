"""Native preprocessing library: build + bit-parity with numpy/reference."""

import numpy as np
import pytest

from echoflow import native
from echoflow.ops.normalize import zeroone_normalizer


@pytest.fixture(scope="module", autouse=True)
def built():
    native.build()
    assert native.available()


def test_zeroone_f32_matches_reference(rng):
    video = (rng.rand(3, 10, 16, 16) * 255).astype(np.float32)
    want = zeroone_normalizer(video.copy())
    got = native.zeroone_normalize_native(video)
    np.testing.assert_array_equal(got, want)


def test_zeroone_u8(rng):
    video = (rng.rand(3, 6, 8, 8) * 255).astype(np.uint8)
    want = zeroone_normalizer(video.astype(np.float32))
    got = native.zeroone_normalize_native(video)
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert got.dtype == np.float32


def test_extract_clips(rng):
    video = rng.rand(3, 40, 8, 8).astype(np.float32)
    starts = np.asarray([0, 5, 8])
    got = native.extract_clips_native(video, starts, clip_len=32)
    assert got.shape == (3, 3, 32, 8, 8)
    for k, s in enumerate(starts):
        np.testing.assert_array_equal(got[k], video[:, s:s + 32])
    with pytest.raises(ValueError):
        native.extract_clips_native(video, [20], clip_len=32)
