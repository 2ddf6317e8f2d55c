"""Clip-study surface: start-point helpers (reference-oracle parity) and
the batched ClipForward / run_clip_study driver."""

import numpy as np
import pytest

import jax

from echoflow.infer.ef import (
    get_all_possible_start_points,
    start_points_covering_frame,
    start_points_of_ed_to_es_clips,
)


# Reference oracles: the branch logic of the study notebooks' helpers
# (echonet_dynamic_test_dataset_ed_or_es_only_clips.ipynb cell 3 /
# echonet_dynamic_test_dataset_consecutive_clips.ipynb cell 3),
# re-stated here as executable specs.

def oracle_covering_frame(mid, length, clip):
    start = max(0, mid - clip + 1)
    end = mid + 1
    if end + clip >= length:
        end = length - clip - 1
    return np.arange(start, end)


def oracle_ed_to_es(ed, es, length, clip):
    shift = clip - (es - ed)
    if length - es < shift:
        return np.arange(ed - shift + 1, length - clip + 1)
    if shift < 0:
        return np.array([ed])
    if ed < shift:
        return np.arange(ed + 1)
    return np.arange(ed - shift + 1, ed + 1)


@pytest.mark.parametrize("mid,length", [(5, 200), (0, 100), (40, 60),
                                        (90, 100), (50, 300), (31, 64)])
def test_covering_frame_matches_reference(mid, length):
    got = start_points_covering_frame(mid, length, 32)
    want = oracle_covering_frame(mid, length, 32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ed,es,length", [
    (10, 25, 200),    # normal: plenty of room
    (3, 20, 200),     # ED near video start
    (170, 190, 200),  # near video end (right-clamped branch)
    (0, 15, 48),      # short video
    (10, 42, 200),    # systole == clip length -> empty
    (10, 50, 200),    # systole > clip -> reference's [ed]
])
def test_ed_to_es_matches_reference(ed, es, length):
    got = start_points_of_ed_to_es_clips(ed, es, length, 32)
    want = oracle_ed_to_es(ed, es, length, 32)
    if want.size and want.min() < 0:
        # The one documented divergence: the reference emits negative
        # starts for very short videos; echoflow clamps at 0.
        want = want[want >= 0]
    np.testing.assert_array_equal(got, want)


def test_clean_helper_agrees_when_coverable():
    # The cleaner get_all_possible_start_points equals the exact twin
    # whenever the window CAN cover ED..ES.
    for ed, es, length in [(10, 25, 200), (3, 20, 200), (170, 190, 200),
                           (0, 15, 48), (10, 41, 200)]:
        np.testing.assert_array_equal(
            get_all_possible_start_points(ed, es, length, 32),
            start_points_of_ed_to_es_clips(ed, es, length, 32))


# ------------------------------------------------------------- batched fwd

@pytest.fixture(scope="module")
def tiny_clip_forward():
    from echoflow.infer.clips import ClipForward
    from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables

    model = R2Plus1DMotionSegNet()
    variables = init_variables(jax.random.PRNGKey(3), model, (1, 3, 32, 32, 32))
    return ClipForward(variables, forward_chunk=4)


def test_clip_forward_shapes_and_chunk_padding(tiny_clip_forward):
    rng = np.random.RandomState(0)
    clips = rng.rand(6, 3, 32, 32, 32).astype(np.float32)  # 6 = 1.5 chunks
    probs, motion = tiny_clip_forward(clips)
    assert probs.shape == (6, 2, 32, 32, 32)
    assert motion.shape == (6, 4, 32, 32, 32)
    np.testing.assert_allclose(np.sum(probs, axis=1), 1.0, atol=1e-5)


def test_segment_start_points_matches_loop(tiny_clip_forward):
    rng = np.random.RandomState(1)
    video = rng.rand(3, 64, 32, 32).astype(np.float32)
    starts = [0, 5, 30]
    labels, probs, _ = tiny_clip_forward.segment_start_points(video, starts)
    assert labels.shape == (3, 32, 32, 32)
    # Batched result == per-clip forward of the same window.
    one = tiny_clip_forward(video[None, :, 5:37])[0]
    np.testing.assert_allclose(probs[1], one[0], atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("study", ["consecutive", "ed_es_only"])
def test_run_clip_study_end_to_end(study, tmp_path):
    import os
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from benchmarks.run_clip_study import main

    out = main(["--study", study, "--frames", "64", "--image-size", "32",
                "--out", str(tmp_path)])
    assert out["length"] == 64
    assert len(out["full_video_lv_curve"]) == 64
    assert (tmp_path / f"clip_study_{study}.json").exists()
    if study == "consecutive":
        assert "per_start_lv_curves" in out and out["per_start_lv_curves"]
    else:
        assert set(out["shift_prototype"]) == {0, 1, 2, 3, 4}
        assert "simpson_volume_curve" in out


def test_segment_start_points_empty(tiny_clip_forward):
    video = np.random.RandomState(3).rand(3, 64, 32, 32).astype(np.float32)
    labels, probs, motion = tiny_clip_forward.segment_start_points(video, [])
    assert labels.shape == (0, 32, 32, 32)
    assert probs.shape == (0, 2, 32, 32, 32)
    assert motion.shape == (0, 4, 32, 32, 32)


def test_clip_forward_accepts_prefolded_variables():
    from echoflow.infer.clips import ClipForward
    from echoflow.models.fold_bn import fold_variables
    from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables

    variables = init_variables(jax.random.PRNGKey(5),
                               R2Plus1DMotionSegNet(), (1, 3, 32, 32, 32))
    folded = fold_variables(variables)
    a = ClipForward(dict(variables))(np.zeros((1, 3, 32, 32, 32), np.float32))
    b = ClipForward(dict(folded))(np.zeros((1, 3, 32, 32, 32), np.float32))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)
