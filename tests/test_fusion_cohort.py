"""Multi-method fusion-cohort driver (benchmarks/run_fusion_cohort.py).

Two things are pinned here: (a) the driver's plumbing end-to-end at tiny
scale — generation, per-method streaming segmentation, EF/Dice aggregates,
cross-method spread, tie-check wiring; (b) the literal-reference path's
parity itself, including the SOFTMAX method that `tests/test_pipeline.py`'s
engine-vs-reference matrix does not cover (the interpolate-on-softmax
notebook's prob-averaging rule, `fuse_utils.py:84-98` + softmax variant).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echoflow.data.synthetic import make_beating_video
from echoflow.infer.pipeline import VideoSegmenter
from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables

pytestmark = pytest.mark.slow  # full-model CPU forwards over real-length videos


@pytest.fixture(scope="module")
def amplified_model():
    """Random init with the seg head amplified 50x: decisive logits, so the
    engine-vs-literal diff measures algorithmic parity, not argmax
    coin-flips on near-0.5 probabilities (same convention as
    tests/test_pipeline.py's tiny_model)."""
    model = R2Plus1DMotionSegNet()
    variables = init_variables(jax.random.PRNGKey(3), model, (1, 3, 32, 32, 32))
    params = variables["params"]
    params["seg_head"]["kernel"] = params["seg_head"]["kernel"] * 50.0
    return model, variables


def test_cohort_driver_end_to_end_tiny(tmp_path):
    from benchmarks.run_fusion_cohort import main

    out = tmp_path / "cohort.json"
    results = main(["--n", "2", "--lengths", "45,64", "--size", "32",
                    "--methods", "majority,softmax", "--fuse", "2",
                    "--tie-videos", "0", "--out", str(out)])

    assert out.exists()
    assert set(results["methods"]) == {"majority", "softmax"}
    assert results["config"]["total_frames_per_method"] == 45 + 64
    for m in ("majority", "softmax"):
        entry = results["methods"][m]
        # Dice is recorded for every video (before any no-beats EF skip).
        assert 0.0 <= entry["ed_lv_dice"]["mean"] <= 1.0
        assert 0.0 <= entry["es_lv_dice"]["mean"] <= 1.0
        assert entry["ef"]["n"] + entry["skipped_no_beats"] == 2


@pytest.mark.parametrize("method", ["softmax", "simple"])
def test_literal_reference_path_matches_engine(amplified_model, method):
    from benchmarks.run_fusion_cohort import literal_reference_masks

    model, variables = amplified_model
    engine = VideoSegmenter(variables, forward_chunk=4, bucket=32)
    beat = make_beating_video(num_frames=45, height=32, width=32,
                              period=20.0, seed=1)
    video = beat.video[:1].astype(np.uint8)  # mono uint8, as the cohort ships

    got = engine.segment_video(video, num_clips=2, step=1, fuse_method=method)
    want = literal_reference_masks(video, model, variables, 2, 1, method)
    assert got.shape == want.shape == (45, 32, 32)
    # Same <=0.1% argmax near-tie budget as the engine-vs-reference matrix.
    mismatch = (got != want).mean()
    assert mismatch <= 1e-3, f"{method} mismatch fraction {mismatch}"
