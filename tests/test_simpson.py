"""get2dPucks / Simpson volume on synthetic ellipses + EDESpairs unit tests."""

import numpy as np

from echoflow.metrics.pairs import EDESpairs
from echoflow.metrics.simpson import (
    computeSimpsonVolume,
    find_boundaries_thick,
    get2dPucks,
    simpson_monoplane_volume,
)


def _ellipse_mask(h, w, cy, cx, ry, rx, angle_deg=0.0):
    yy, xx = np.mgrid[0:h, 0:w]
    th = np.deg2rad(angle_deg)
    y = (yy - cy) * np.cos(th) + (xx - cx) * np.sin(th)
    x = -(yy - cy) * np.sin(th) + (xx - cx) * np.cos(th)
    return ((y / ry) ** 2 + (x / rx) ** 2 <= 1.0).astype(int)


def test_empty_mask_conventions():
    length, radii = get2dPucks(np.zeros((112, 112), int), (1.0, 1.0))
    assert length == 1.0
    np.testing.assert_array_equal(radii, np.zeros(10))


def test_ellipse_axis_length_and_radii():
    mask = _ellipse_mask(112, 112, 56, 56, ry=40, rx=15)
    length, radii = get2dPucks(mask, (1.0, 1.0))
    # Principal extent ~ 2 * ry, radii bounded by rx.
    assert 72 < length < 84
    assert radii.shape == (10,)
    assert radii.max() <= 16.5
    assert radii[4] > 12  # central pucks near rx
    assert radii[0] < radii[4]  # tapered ends


def test_rotation_invariance_of_volume():
    v0 = simpson_monoplane_volume(_ellipse_mask(112, 112, 56, 56, 40, 15, 0))
    v45 = simpson_monoplane_volume(_ellipse_mask(112, 112, 56, 56, 40, 15, 45))
    assert abs(v0 - v45) / v0 < 0.08


def test_biplane_volume_of_sphere():
    # A circle in both views approximates a sphere: V = 4/3 pi r^3.
    r = 30
    mask = _ellipse_mask(112, 112, 56, 56, r, r)
    v = computeSimpsonVolume(mask, mask, (1.0, 1.0), (1.0, 1.0))
    expected = 4.0 / 3.0 * np.pi * r ** 3
    assert abs(v - expected) / expected < 0.1


def test_find_boundaries_thick_matches_definition():
    mask = _ellipse_mask(20, 20, 10, 10, 6, 4)
    b = find_boundaries_thick(mask)
    # Boundary pixels exist, interior pixels are excluded.
    assert b.sum() > 0
    interior = (mask == 1) & ~b
    # Every interior pixel has all 4-neighbors equal to 1.
    ys, xs = np.where(interior)
    for y, x in zip(ys, xs):
        assert mask[y - 1, x] == mask[y + 1, x] == mask[y, x - 1] == mask[y, x + 1] == 1
    # A pixel just inside the edge is boundary.
    assert b[4, 10] or b[5, 10]


def test_edes_pairs_basic():
    assert EDESpairs([0, 50, 100], [20, 70, 120]) == [(0, 20), (50, 70), (100, 120)]
    # Systole before any diastole is dropped.
    assert EDESpairs([30], [10, 45]) == [(30, 45)]
    # Two systoles after the same diastole: only the first is kept.
    assert EDESpairs([0], [20, 40]) == [(0, 20)]
    # Unsorted inputs are sorted first.
    assert EDESpairs([100, 0], [120, 20]) == [(0, 20), (100, 120)]
