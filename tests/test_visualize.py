"""Visualization parity: FP/FN difference overlay + Simpson-volume GIF strip
(reference src/visualization_utils.py:346-538)."""

import numpy as np

from echoflow.utils.visualize import (
    LV_COLOR,
    LV_COMP_COLOR,
    echonet_overlay,
    make_annotated_gif,
    simpson_volume_curve,
)


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def test_overlay_fp_fn_difference_colors():
    """With `truth`, FP pixels get the LV color added, FN its complement,
    agreeing pixels stay plain echo (reference
    visualization_utils.py:424-434)."""
    frame = np.full((16, 16), 0.2, np.float32)
    pred = _disk(16, 16, 8, 8, 5)
    truth = _disk(16, 16, 8, 6, 5)  # shifted: both FPs and FNs exist
    out = echonet_overlay(frame, pred, truth=truth)
    assert out.shape == (16, 16, 3)
    fp = (pred == 1) & (truth == 0)
    fn = (pred == 0) & (truth == 1)
    agree = ~(fp | fn)
    np.testing.assert_allclose(
        out[fp], np.broadcast_to(0.2 + np.array(LV_COLOR), out[fp].shape), atol=1e-6)
    np.testing.assert_allclose(
        out[fn], np.broadcast_to(0.2 + np.array(LV_COMP_COLOR), out[fn].shape), atol=1e-6)
    np.testing.assert_allclose(out[agree], np.full_like(out[agree], 0.2), atol=1e-6)


def test_overlay_perfect_prediction_is_plain_echo():
    frame = np.full((12, 12), 0.5, np.float32)
    mask = _disk(12, 12, 6, 6, 4)
    out = echonet_overlay(frame, mask, truth=mask)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_simpson_volume_curve_tracks_lv_size():
    small = _disk(32, 32, 16, 16, 6)
    big = _disk(32, 32, 16, 16, 11)
    vols = simpson_volume_curve(np.stack([small, big, small]))
    assert vols.shape == (3,)
    assert vols[1] > vols[0] > 0
    assert vols[0] == vols[2]


def test_annotated_gif_writes_volume_strip(tmp_path):
    rng = np.random.RandomState(0)
    segs = np.stack([_disk(24, 24, 12, 12, 5 + (t % 3)) for t in range(4)])
    video = rng.rand(3, 4, 24, 24).astype(np.float32)
    path = str(tmp_path / "anno.gif")
    assert make_annotated_gif(segs, video, path) == path
    from PIL import Image

    with Image.open(path) as im:
        assert im.n_frames == 4
