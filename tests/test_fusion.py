"""Fusion unit tests on synthetic raters (SURVEY.md §7.2 step 5 gate)."""

import numpy as np
import jax.numpy as jnp

from echoflow.ops.fusion import (
    fuse_frames,
    majority_vote,
    simple_fuse,
    softmax_mean_fuse,
    staple_fuse,
)


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def _noisy_raters(rng, truth, n, flip=0.02):
    raters = []
    for _ in range(n):
        noise = rng.rand(*truth.shape) < flip
        raters.append((truth ^ noise).astype(np.uint8))
    return np.stack(raters)


def test_majority_recovers_truth(rng):
    truth = _disk(64, 64, 32, 32, 14)
    raters = _noisy_raters(rng, truth, 5)
    fused = np.asarray(majority_vote(jnp.asarray(raters)))
    assert (fused != truth).mean() < 0.01


def test_majority_tie_goes_to_background():
    raters = np.stack([np.ones((4, 4), np.uint8), np.zeros((4, 4), np.uint8)])
    fused = np.asarray(majority_vote(jnp.asarray(raters)))
    assert fused.sum() == 0


def test_simple_downweights_bad_rater(rng):
    truth = _disk(64, 64, 32, 32, 14)
    good = _noisy_raters(rng, truth, 4, flip=0.01)
    bad = _disk(64, 64, 10, 10, 20)[None]  # completely wrong rater
    raters = np.concatenate([good, bad])
    fused = np.asarray(simple_fuse(jnp.asarray(raters)))
    # The bad rater must not drag the estimate toward its region.
    assert fused[10, 10] == 0
    assert (fused != truth).mean() < 0.01


def test_staple_recovers_truth(rng):
    truth = _disk(48, 48, 24, 24, 10)
    raters = _noisy_raters(rng, truth, 5, flip=0.05)
    fused = np.asarray(staple_fuse(jnp.asarray(raters)))
    assert (fused != truth).mean() < 0.02


def test_softmax_mean_with_validity_mask(rng):
    probs = np.zeros((3, 2, 8, 8), np.float32)
    probs[0, 1] = 0.9
    probs[0, 0] = 0.1
    probs[1, 0] = 0.9
    probs[1, 1] = 0.1
    probs[2, 0] = 0.9
    probs[2, 1] = 0.1
    # Only rater 0 valid -> foreground; all valid -> background majority.
    only0 = np.asarray(softmax_mean_fuse(jnp.asarray(probs), jnp.asarray([1, 0, 0])))
    assert only0.min() == 1
    allv = np.asarray(softmax_mean_fuse(jnp.asarray(probs), jnp.asarray([1, 1, 1])))
    assert allv.max() == 0


def test_fuse_frames_batched(rng):
    truth = _disk(32, 32, 16, 16, 8)
    frames = []
    valid = []
    for t in range(6):
        raters = _noisy_raters(rng, truth, 4, flip=0.02)
        frames.append(raters)
        valid.append([1, 1, 1, 1] if t % 2 == 0 else [1, 1, 0, 0])
    stack = jnp.asarray(np.stack(frames))
    v = jnp.asarray(np.array(valid, np.float32))
    for method in ("majority", "simple", "staple"):
        fused = np.asarray(fuse_frames(stack, v, method=method))
        assert fused.shape == (6, 32, 32)
        assert (fused[0] != truth).mean() < 0.02
