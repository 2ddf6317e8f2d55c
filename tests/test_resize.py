"""Golden-value tests: trilinear/linear resize vs torch.nn.functional.interpolate.

Covers both align_corners conventions the reference mixes (SURVEY.md §7.3)
and the exact shapes the pipeline uses (decoder upsampling, ragged-tail clip
interpolation with np.round banker's rounding, systole shrink).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from echoflow.ops.resize import linear_resize_matrix, resize_linear, trilinear_resize


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "src,dst",
    [(7, 14), (14, 7), (10, 32), (32, 10), (56, 112), (4, 32), (175, 160), (175, 192), (1, 5), (5, 1), (3, 3)],
)
def test_linear_matrix_matches_torch(align, src, dst, rng):
    x = rng.randn(2, 3, src).astype(np.float32)
    ours = np.asarray(resize_linear(jnp.asarray(x), axis=-1, dst_len=dst, align_corners=align))
    theirs = F.interpolate(torch.from_numpy(x), size=dst, mode="linear", align_corners=align).numpy()
    # atol 1e-4: fp32 einsum reduction-order noise on long source axes; the
    # weight matrix itself is compared exactly against torch's effective
    # matrix in the tests below.
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("src,dst", [(175, 160), (175, 192), (7, 14), (45, 32)])
def test_matrix_exactly_matches_torch_effective_matrix(align, src, dst):
    eye = torch.eye(src).unsqueeze(1)
    effective = F.interpolate(eye, size=dst, mode="linear", align_corners=align)
    torch_matrix = effective[:, 0, :].numpy().T  # (dst, src)
    ours = np.asarray(linear_resize_matrix(src, dst, align))
    np.testing.assert_allclose(ours, torch_matrix, atol=2e-7)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "src_shape,dst_size",
    [
        ((4, 7, 7), (32, 112, 112)),   # decoder layer-4 upsample (align=True in ref)
        ((32, 56, 56), (32, 112, 112)),  # stem upsample
        ((45, 112, 112), (32, 112, 112)),  # ragged tail shrink (align=False in ref)
        ((20, 112, 112), (32, 112, 112)),  # systole shrink-expand
        ((64, 112, 112), (71, 112, 112)),  # softmax re-interp to odd length
    ],
)
def test_trilinear_matches_torch(align, src_shape, dst_size, rng):
    x = rng.randn(1, 2, *src_shape).astype(np.float32)
    ours = np.asarray(trilinear_resize(jnp.asarray(x), dst_size, align_corners=align))
    theirs = F.interpolate(torch.from_numpy(x), size=dst_size, mode="trilinear", align_corners=align).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_matrix_rows_sum_to_one():
    for align in (True, False):
        for src, dst in [(7, 19), (19, 7), (112, 224)]:
            m = np.asarray(linear_resize_matrix(src, dst, align))
            np.testing.assert_allclose(m.sum(axis=1), np.ones(dst), atol=1e-6)


def test_identity_when_same_size(rng):
    x = rng.randn(2, 3, 16).astype(np.float32)
    out = resize_linear(jnp.asarray(x), -1, 16, align_corners=False)
    np.testing.assert_array_equal(np.asarray(out), x)
