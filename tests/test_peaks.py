"""find_peaks_1d vs scipy.signal.find_peaks on LV-area-curve-like signals."""

import numpy as np
import pytest
from scipy.signal import find_peaks as scipy_find_peaks

from echoflow.ops.peaks import find_peaks_1d, local_maxima_1d, peak_prominences


def _lv_like_curve(rng, n=240):
    t = np.arange(n)
    base = 800 + 300 * np.sin(2 * np.pi * t / 47.0) + 40 * np.sin(2 * np.pi * t / 9.0)
    return base + 15 * rng.randn(n)


@pytest.mark.parametrize("seed", range(20))
def test_matches_scipy_on_noisy_curves(seed):
    rng = np.random.RandomState(seed)
    x = _lv_like_curve(rng)
    prom = 0.5 * (np.percentile(x, 95) - np.percentile(x, 5))
    for sig in (x, -x):
        ours = find_peaks_1d(sig, distance=20, prominence=prom)
        theirs = scipy_find_peaks(sig, distance=20, prominence=prom)[0]
        np.testing.assert_array_equal(ours, theirs)


def test_plateaus_and_edges():
    x = np.array([0, 1, 1, 1, 0, 2, 0, 3, 3, 0, 1], dtype=float)
    np.testing.assert_array_equal(local_maxima_1d(x), scipy_find_peaks(x)[0])
    ours = find_peaks_1d(x, distance=2, prominence=0.5)
    theirs = scipy_find_peaks(x, distance=2, prominence=0.5)[0]
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("seed", range(5))
def test_prominences_match_scipy(seed):
    from scipy.signal import peak_prominences as scipy_proms

    rng = np.random.RandomState(seed)
    x = _lv_like_curve(rng, 150)
    peaks = local_maxima_1d(x)
    np.testing.assert_allclose(peak_prominences(x, peaks), scipy_proms(x, peaks)[0])


def test_equal_height_distance_tiebreak():
    # Two equal peaks closer than `distance`: scipy keeps the one with higher
    # argsort priority; make sure we replicate the exact choice.
    x = np.array([0, 5, 0, 0, 5, 0, 0, 0, 0, 0, 4, 0], dtype=float)
    for d in (2, 4, 8):
        np.testing.assert_array_equal(
            find_peaks_1d(x, distance=d), scipy_find_peaks(x, distance=d)[0]
        )
