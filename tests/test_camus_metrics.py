"""CAMUS metrics + echo IO helper tests."""

import numpy as np

from echoflow.metrics.camus import (
    camus_dice_by_name,
    dict_extend_values,
    getDices,
)
from echoflow.utils.echo_io import (
    read_mhd,
    readTransformResizeImage,
    transformResizeAndFlipImage,
    transformResizeImage,
)


def _fake_batch(rng, n=2, h=16, w=16):
    labels = rng.randint(0, 4, (n, 1, h, w)).astype(np.int64)
    logits = np.full((n, 4, h, w), -5.0, np.float32)
    for i in range(n):
        for k in range(4):
            logits[i, k][labels[i, 0] == k] = 5.0
    return logits, labels


def test_getdices_perfect(rng):
    logits, labels = _fake_batch(rng)
    d = getDices(logits, labels)
    np.testing.assert_allclose(d, np.ones_like(d))


def test_camus_dice_by_name_and_combs(rng):
    logits, labels = _fake_batch(rng)
    d = camus_dice_by_name(logits, labels)
    for name in ("BG", "LV", "Myo", "LA", "LVepi"):
        np.testing.assert_allclose(d[name], [1.0, 1.0])
    # label-map input path
    d2 = camus_dice_by_name(np.argmax(logits, axis=1), labels)
    np.testing.assert_allclose(d2["LV"], [1.0, 1.0])


def test_dict_extend_values():
    a = {"x": np.array([1.0]), "y": np.array([2.0])}
    b = {"x": np.array([3.0]), "z": np.array([4.0])}
    m = dict_extend_values(a, b)
    np.testing.assert_array_equal(m["x"], [1.0, 3.0])
    np.testing.assert_array_equal(m["y"], [2.0])
    np.testing.assert_array_equal(m["z"], [4.0])


def test_transform_resize_image(rng):
    video = (rng.rand(5, 20, 24) * 255).astype(np.float32)
    out = transformResizeImage(video, (16, 16))
    assert out.shape == (5, 16, 16)
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6
    # label path: nearest, stays integer set
    lab = rng.randint(0, 4, (20, 24)).astype(np.int64)
    out_lab = transformResizeImage(lab, (10, 10), outtype=np.int64)
    assert out_lab.shape == (1, 10, 10)
    assert set(np.unique(out_lab)) <= {0, 1, 2, 3}
    flipped = transformResizeAndFlipImage(video, (16, 16))
    np.testing.assert_allclose(flipped, np.flip(out, axis=-1), atol=2e-7)


def test_mhd_roundtrip(tmp_path, rng):
    vol = (rng.rand(4, 8, 10) * 255).astype(np.uint8)
    raw = tmp_path / "img.raw"
    vol.tofile(raw)
    mhd = tmp_path / "img.mhd"
    mhd.write_text(
        "ObjectType = Image\nNDims = 3\nDimSize = 10 8 4\n"
        "ElementType = MET_UCHAR\nElementDataFile = img.raw\n")
    back = read_mhd(str(mhd))
    np.testing.assert_array_equal(back, vol)
    resized = readTransformResizeImage(str(mhd), (8, 8))
    assert resized.shape == (4, 8, 8)
