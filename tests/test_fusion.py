"""Fusion unit tests on synthetic raters (SURVEY.md §7.2 step 5 gate)."""

import numpy as np
import pytest
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


# --------------------------------------------------------------------------
# Adversarial tie / outlier cases with a documented divergence budget.
#
# The reference delegates fusion to the ITK-backed `LabelFusion` package
# (reference src/fuse_utils.py:95), which is not installable here (no pip,
# no ITK wheel in the image), so bit-parity against it cannot be asserted
# directly (SURVEY.md §7.3 flags exactly this risk). The contract tested
# instead:
#   - on non-degenerate inputs (majority margin >= 1 rater, no exact
#     posterior ties) every fuser's output is FULLY DETERMINED by the
#     algorithm definition, and implementations can only differ on the
#     tie/degenerate set below;
#   - the divergence budget is therefore: masks may differ from ITK's ONLY
#     on (a) pixels where the active-rater vote is exactly split, and
#     (b) STAPLE pixels with exactly equal class posteriors — for which
#     ITK's MultiLabelSTAPLE assigns `labelForUndecidedPixels` (default:
#     one past the largest input label), reproduced by
#     staple_fuse(undecided_label=2).
# --------------------------------------------------------------------------


def test_staple_undecided_pixel_convention():
    # Two perfectly contradicting raters: every pixel's posterior is an
    # exact tie, ITK MultiLabelSTAPLE marks them all undecided (= 2 for a
    # binary problem).
    a = np.zeros((6, 6), np.uint8)
    a[:, :3] = 1
    raters = np.stack([a, 1 - a])
    fused = np.asarray(staple_fuse(jnp.asarray(raters), undecided_label=2))
    assert (fused == 2).all()
    # Default (pipeline) mode decides ties to foreground, never emits 2.
    fused_bin = np.asarray(staple_fuse(jnp.asarray(raters)))
    assert set(np.unique(fused_bin)) <= {0, 1}


def test_staple_undecided_only_on_ties(rng):
    truth = _disk(32, 32, 16, 16, 8)
    raters = _noisy_raters(rng, truth, 5, flip=0.03)
    fused = np.asarray(staple_fuse(jnp.asarray(raters), undecided_label=2))
    # Odd rater count + asymmetric (p, q): no exact ties -> no undecided.
    assert (fused != 2).all()
    assert (fused != truth).mean() < 0.02


def test_simple_split_vote_tie_pixels():
    # 4 raters, 2 vote foreground on the left half, 2 on the right: every
    # disagreeing pixel is an exact split. Our majority sends split pixels
    # to background (strict > 0.5); any divergence from ITK-SIMPLE is
    # confined to exactly this split set (the divergence budget).
    left = np.zeros((8, 8), np.uint8)
    left[:, :4] = 1
    right = 1 - left
    raters = np.stack([left, left, right, right])
    fused = np.asarray(simple_fuse(jnp.asarray(raters)))
    assert fused.sum() == 0  # ties -> background everywhere


def test_simple_is_stable_under_duplicated_raters(rng):
    truth = _disk(32, 32, 16, 16, 9)
    raters = _noisy_raters(rng, truth, 3, flip=0.02)
    dup = np.concatenate([raters, raters])
    f1 = np.asarray(simple_fuse(jnp.asarray(raters)))
    f2 = np.asarray(simple_fuse(jnp.asarray(dup)))
    np.testing.assert_array_equal(f1, f2)


def test_single_rater_passthrough():
    truth = _disk(16, 16, 8, 8, 5)
    one = jnp.asarray(truth[None])
    np.testing.assert_array_equal(np.asarray(majority_vote(one)), truth)
    np.testing.assert_array_equal(np.asarray(simple_fuse(one)), truth)
    np.testing.assert_array_equal(np.asarray(staple_fuse(one)), truth)


def test_simple_outlier_never_resurrects(rng):
    # An all-foreground outlier among good raters must stay dropped across
    # rounds (the best-rater-kept rule must not re-activate it).
    truth = _disk(48, 48, 24, 24, 10)
    good = _noisy_raters(rng, truth, 4, flip=0.01)
    outlier = np.ones_like(truth)[None]
    fused = np.asarray(simple_fuse(jnp.asarray(np.concatenate([good, outlier]))))
    assert (fused != truth).mean() < 0.01
    # Background corners must not be pulled to foreground by the outlier.
    assert fused[0, 0] == 0 and fused[-1, -1] == 0


def test_masked_fusers_equal_compacted_live_stack(rng):
    """The mask-aware simple/staple paths must reproduce fusion of the
    *compacted* live-only stack — the reference's variable-size live-rater
    semantics (fuse_utils.py:84-98) expressed as a static-shape graph. Dead
    slots are filled with garbage to prove they cannot leak in."""
    truth = _disk(32, 32, 16, 16, 9)
    for n_live in (2, 3, 4):
        raters = _noisy_raters(rng, truth, n_live, flip=0.03)
        garbage = (rng.rand(2, 32, 32) > 0.5).astype(np.uint8)
        padded = np.concatenate([raters, garbage])
        live = jnp.asarray([1.0] * n_live + [0.0] * 2)
        for fuser, kwargs in ((simple_fuse, dict(num_iters=5)),
                              (staple_fuse, {})):
            want = np.asarray(fuser(jnp.asarray(raters), **kwargs))
            got = np.asarray(fuser(jnp.asarray(padded), live=live, **kwargs))
            # fp-order near-ties only; on these inputs there are none.
            np.testing.assert_array_equal(got, want)


def test_masked_fusers_dead_slot_position_invariance(rng):
    """Liveness must be positional, not prefix-shaped: dead raters in the
    middle of the stack behave like dead raters at the end."""
    truth = _disk(24, 24, 12, 12, 7)
    raters = _noisy_raters(rng, truth, 3, flip=0.04)
    garbage = np.ones((1, 24, 24), np.uint8)
    end_stack = jnp.asarray(np.concatenate([raters, garbage]))
    mid_stack = jnp.asarray(np.stack([raters[0], garbage[0], raters[1], raters[2]]))
    live_end = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    live_mid = jnp.asarray([1.0, 0.0, 1.0, 1.0])
    for fuser in (simple_fuse, staple_fuse):
        a = np.asarray(fuser(end_stack, live=live_end))
        b = np.asarray(fuser(mid_stack, live=live_mid))
        np.testing.assert_array_equal(a, b)


def test_fuse_frames_single_live_rater_copies_through(rng):
    """Reference fuse_utils.py:92-93: one live rater -> copy, not fuse."""
    truth = _disk(16, 16, 8, 8, 5)
    garbage = (rng.rand(2, 16, 16) > 0.5).astype(np.uint8)
    stack = jnp.asarray(np.stack([truth, *garbage])[None])  # (1, 3, H, W)
    valid = jnp.asarray([[1.0, 0.0, 0.0]])
    for method in ("majority", "simple", "staple"):
        fused = np.asarray(fuse_frames(stack, valid, method=method))
        np.testing.assert_array_equal(fused[0], truth)


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


# --------------------------------------------------------------------------
# SIMPLE hyper-parameter sensitivity (round-3 verdict item 6): the
# (num_iters=5, alpha=1.0) defaults are self-chosen per the SIMPLE paper,
# not inherited from ITK. Measured across iters ∈ {3,5,8} x alpha ∈
# {0.75,1.0,1.25} on realistic 5-rater stacks (4 raters at 3% flip noise
# plus one gross outlier — the shift-ensemble's actual regime), the fused
# mask is NOT parameter-invariant: up to ~2.9% of pixels swing between
# settings, because with so few raters the mean - alpha*std cut discretely
# flips whether the outlier (or a marginal good rater) survives, and the
# small survivor set's majority vote moves with it. The defaults are
# therefore PART OF THE OUTPUT CONTRACT (documented in ops/fusion.py);
# what must hold for any setting in the neighborhood is bounded accuracy,
# pinned here.

@pytest.mark.parametrize("num_iters", [3, 5, 8])
@pytest.mark.parametrize("alpha", [0.75, 1.0, 1.25])
def test_simple_hyperparams_bounded_accuracy(num_iters, alpha):
    for seed in range(3):
        rng_l = np.random.RandomState(seed)
        truth = _disk(64, 64, 32, 32, 14)
        good = _noisy_raters(rng_l, truth, 4, flip=0.03)
        bad = _disk(64, 64, 12, 12, 18)[None]
        raters = jnp.asarray(np.concatenate([good, bad]))
        fused = np.asarray(simple_fuse(raters, num_iters=num_iters, alpha=alpha))
        err = (fused != truth).mean()
        # Every grid point must beat a single noisy rater (3% + outlier
        # influence); observed max across the grid is 3.05%.
        assert err <= 3.2e-2, (
            f"iters={num_iters} alpha={alpha} seed={seed}: err {err:.4f}")


def test_simple_default_hyperparams_are_pinned():
    """The engine's parity behavior depends on (num_iters=5, alpha=1.0) —
    changing the defaults is a user-visible mask change (see sensitivity
    measurement above) and must be a conscious, test-breaking decision."""
    import inspect

    sig = inspect.signature(simple_fuse)
    assert sig.parameters["num_iters"].default == 5
    assert sig.parameters["alpha"].default == 1.0


# ---------------------------------------------------------------------------
# ITK goldens (docs/ITK_FUSION_FIDELITY.md): pixel-diff echoflow's
# SIMPLE/STAPLE against the actual LabelFusion/ITK outputs the reference
# calls (src/fuse_utils.py:95), captured by benchmarks/make_itk_goldens.py
# in an ITK-capable environment on the 20 committed deterministic stacks.
# Skipped while the goldens file is absent (this environment has no network
# egress, so SimpleITK/LabelFusion cannot be installed here).
# ---------------------------------------------------------------------------

_ITK_GOLDENS = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "goldens",
    "itk_fusion_goldens.npz")


@pytest.mark.skipif(not __import__("os").path.exists(_ITK_GOLDENS),
                    reason="ITK goldens not generated yet "
                           "(benchmarks/make_itk_goldens.py)")
@pytest.mark.parametrize("method", ["simple", "staple"])
def test_fusion_matches_itk_goldens(method):
    from echoflow.data.fixtures import make_fusion_rater_stacks

    goldens = np.load(_ITK_GOLDENS)
    fuse = {"simple": simple_fuse, "staple": staple_fuse}[method]
    report = {}
    for name, stack in make_fusion_rater_stacks():
        want = goldens[f"{name}/{method}"]
        got = np.asarray(fuse(jnp.asarray(stack)))
        # STAPLE exact-posterior ties may carry ITK's undecided label (2);
        # those pixels are the documented divergence class — score them
        # as disagreement so the budget below covers them explicitly.
        agree = float((got == want).mean())
        report[name] = agree
        # Unanimous raters admit no divergence class at all.
        if name == "agree3":
            assert agree == 1.0, f"{method} diverged on a unanimous stack"
    worst = min(report, key=report.get)
    # Divergence budget: only split-vote ties (SIMPLE) / equal-posterior
    # pixels (STAPLE) may differ — bounded well under 0.5% of pixels on
    # every committed stack. A larger gap means a semantic mismatch.
    assert report[worst] >= 0.995, (
        f"{method} vs ITK worst stack {worst}: {report[worst]:.4f} "
        f"(full report: {report})")
