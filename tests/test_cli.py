"""Golden-artifact regression net over the user-facing CLI entry point
(reference motion_segment.py:127-150): run `motion_segment.main` on a
synthetic AVI with `-c all` and pin the artifact set + pkl mask contents."""

import os
import pickle

import numpy as np
import pytest

import motion_segment
from echoflow.data.synthetic import write_synthetic_avi

CKPT = os.path.join(os.path.dirname(__file__), "..", "save_models",
                    "synthetic_clasfv.pkl")


@pytest.mark.slow
def test_cli_all_artifacts_match_engine_golden(tmp_path):
    if not os.path.exists(CKPT):
        pytest.skip("synthetic checkpoint not present")
    # 96 frames / period 24: interior diastole peaks at ~30/54/78 keep full
    # prominence and survive the reference's >= p85 diastole filter (a
    # 64-frame video starting mid-beat legitimately yields zero pairs under
    # the reference algorithm — edge-truncated prominence).
    avi = str(tmp_path / "echo.avi")
    write_synthetic_avi(avi, num_frames=96, period=24.0, seed=3)
    outdir = str(tmp_path / "out")

    segs, efs, pairs = motion_segment.main([
        "-p", avi, "-m", CKPT, "-f", "2", "-s", "1",
        "--fuse_method", "simple", "-c", "all", "-o", outdir, "-v",
    ])

    assert segs.shape == (96, 112, 112) and segs.dtype == np.uint8
    # The trained checkpoint on a 2.6-beat synthetic video must find beats
    # with physical EFs (the synthetic e2e benchmark pins accuracy; this
    # test pins the CLI plumbing around it).
    assert len(pairs) >= 1
    for ef in efs:
        assert 0 < ef < 100

    # All four artifact kinds (reference filenames, motion_segment.py:127-150).
    files = sorted(os.listdir(outdir))
    assert "echo_annotated.gif" in files
    assert "echo_whole_video_segmentation.pkl" in files
    ed_pkls = [f for f in files if "_ED_Frame_" in f]
    es_pkls = [f for f in files if "_ES_Frame_" in f]
    assert len(ed_pkls) == len(set(p[0] for p in pairs))
    assert len(es_pkls) == len(set(p[1] for p in pairs))

    # Golden: the library engine on the identically preprocessed video must
    # reproduce the CLI's pkl masks bit-for-bit (same graph, same inputs).
    from echoflow.infer.pipeline import VideoSegmenter
    from echoflow.ops.normalize import zeroone_normalizer
    from echoflow.train.checkpoint import load_model_variables

    raw = motion_segment.read_video_rgb(avi)
    video = zeroone_normalizer(raw.transpose(3, 0, 1, 2).astype(np.float32))
    golden = VideoSegmenter(load_model_variables(CKPT)).segment_video(
        video, num_clips=2, step=1, fuse_method="simple")

    with open(os.path.join(outdir, "echo_whole_video_segmentation.pkl"), "rb") as f:
        np.testing.assert_array_equal(pickle.load(f), golden)
    for ed, es in pairs:
        with open(os.path.join(
                outdir, f"echo_ED_Frame_{ed}_segmentation.pkl"), "rb") as f:
            np.testing.assert_array_equal(pickle.load(f), golden[ed])
        with open(os.path.join(
                outdir, f"echo_ES_Frame_{es}_segmentation.pkl"), "rb") as f:
            np.testing.assert_array_equal(pickle.load(f), golden[es])


def test_cli_precision_flag_maps_to_engine_policy():
    """`--precision` maps onto the engine's dtype policy exactly. The CLI
    default is fp32 — the CLI is the reference parity surface and the
    identical-masks clause of the BASELINE north star binds it (the
    reference runs fp32); the library ENGINE defaults to "auto"
    (platform-resolved bf16/fp32), gated by the ground-truth Dice bar.
    fp32 pins the parity path anywhere, mixed sets the
    bf16-backbone/fp32-head split, bf16 forces bf16."""
    import jax.numpy as jnp

    from echoflow.infer.pipeline import VideoSegmenter

    args = motion_segment.parse_args(["-p", "v.avi"])
    assert args.precision == "fp32"
    for flag in ("auto", "fp32", "mixed", "bf16"):
        assert motion_segment.parse_args(
            ["-p", "v.avi", "--precision", flag]).precision == flag

    assert motion_segment.precision_policy("auto") == {}
    assert motion_segment.precision_policy("fp32") == {"dtype": jnp.float32}
    assert motion_segment.precision_policy("mixed") == {
        "dtype": jnp.float32, "backbone_dtype": jnp.bfloat16}
    assert motion_segment.precision_policy("bf16") == {"dtype": jnp.bfloat16}
    # "auto" is the engine's own default policy.
    assert VideoSegmenter.__dataclass_fields__["dtype"].default == "auto"


def test_cli_preprocess_resizes_and_normalizes_non_model_sized_video(tmp_path):
    """The CLI preprocessing chain (decode -> transpose -> trilinear resize
    align_corners=True -> zeroone normalize) on a non-112x112 input —
    regression for the read-only-array crash on exactly this path."""
    avi = str(tmp_path / "echo160.avi")
    write_synthetic_avi(avi, num_frames=12, height=160, width=160)
    video = motion_segment.load_and_preprocess_video(avi, 112, 112)
    assert video.shape == (3, 12, 112, 112)
    assert video.dtype == np.float32
    for c in range(3):
        assert float(video[c].min()) == 0.0 and float(video[c].max()) == 1.0


def test_cli_preprocess_keeps_model_sized_video_unresized(tmp_path):
    avi = str(tmp_path / "echo112.avi")
    write_synthetic_avi(avi, num_frames=8, height=112, width=112)
    video = motion_segment.load_and_preprocess_video(avi)
    assert video.shape == (3, 8, 112, 112)
    assert video.dtype == np.float32
