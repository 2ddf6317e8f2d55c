"""EF benchmark driver e2e over the synthetic EchoNet-format fixture dir.

The real EchoNet-Dynamic data is access-gated, so the `--data` path of
`benchmarks/run_ef_benchmark.py` — the command that would produce the
published-number parity run (BASELINE.md: EF MAE 5.25%, ED Dice 0.9354) —
is exercised here against `data/fixtures.make_synthetic_echonet_root`,
asserting the full CSV -> AVI decode -> trace rasterization -> segment ->
EF/Dice plumbing. If access ever lands, the parity run is one command
(round-3 verdict item 8).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model CPU forwards over real-length videos

_CKPT = os.path.join(os.path.dirname(__file__), "..", "save_models",
                     "synthetic_clasfv.pkl")


def _model_arg():
    """The trained synthetic checkpoint is a generated artifact (126 MB,
    not committed; rebuild: `python benchmarks/run_bf16_train_study.py
    --save-fp32-checkpoint`). These tests assert PLUMBING (CSV -> decode ->
    trace -> segment -> EF/Dice), which random weights exercise equally, so
    fall back to them rather than skipping when it is absent."""
    return ["--model", _CKPT] if os.path.exists(_CKPT) else []


def test_ef_benchmark_data_path_on_fixture_dir(tmp_path):
    from benchmarks.run_ef_benchmark import main
    from echoflow.data.fixtures import make_synthetic_echonet_root

    root = make_synthetic_echonet_root(tmp_path, n_videos=4, num_frames=64,
                                       trace_file_order="es_first", seed=11)
    out = tmp_path / "ef_results.json"
    results = main(["--data", str(root), "--split", "train", "--fuse", "2",
                    "--out", str(out)] + _model_arg())

    # The TRAIN split of a 4-video fixture holds exactly 2 videos; every
    # sample either produced EFs or was counted as skipped — none may be
    # silently dropped by the CSV/video/trace plumbing.
    n_scored = results["ef"].get("n", 0)
    assert n_scored + results["skipped_no_beats"] == 2
    assert out.exists()

    # Dice against the rasterized clinical-style traces must have been
    # computed for every scored video, and be a genuine overlap value.
    if n_scored:
        assert results["ed_lv_dice"]["mean"] is not None
        assert 0.0 <= results["ed_lv_dice"]["mean"] <= 1.0
        assert 0.0 <= results["es_lv_dice"]["mean"] <= 1.0
        assert np.isfinite(results["ef"]["mae"])

    # Fusion-notebook protocol (cell 6): Dice is recorded for EVERY
    # readable video, before the no-beats EF skip — so the dice count is
    # the full readable split, not just the EF-scored subset.
    assert results["ed_lv_dice"]["n"] == 2
    assert results["es_lv_dice"]["n"] == 2


def test_ef_benchmark_applies_test_split_truncation(tmp_path, monkeypatch):
    """Benchmark-protocol special case (fusion notebook cell 6): a test
    video listed in `data.qa.TRUNCATED_TEST_INDICES` is cut to its first N
    frames BEFORE segmentation. Asserted with a synthetic truncated entry:
    the run's total segmented frames drop by exactly the truncation."""
    from benchmarks.run_ef_benchmark import main
    from echoflow.data import qa as data_qa
    from echoflow.data.echonet import EchoNetDynamicDataset
    from echoflow.data.fixtures import make_synthetic_echonet_root

    root = make_synthetic_echonet_root(tmp_path, n_videos=4, num_frames=64,
                                       trace_file_order="es_first", seed=11)
    # The 4-video fixture's TEST split holds exactly one video (index 0).
    # Pick a cut past its traced ED/ES frames (the reference's 1053 cut
    # also leaves its traced frames intact — Dice still indexes them).
    ds = EchoNetDynamicDataset(str(root), split="test", clip_length="full",
                               raise_for_es_ed=False)
    assert len(ds) == 1
    _, (_, _, es_ci, ed_ci, *_rest) = ds[0]
    cut = max(int(ed_ci), int(es_ci)) + 16  # 46 for this fixture/seed
    assert cut < 64

    base = main(["--data", str(root), "--split", "test", "--fuse", "2"]
                + _model_arg())
    assert base["total_frames"] == 64

    monkeypatch.setattr(data_qa, "TRUNCATED_TEST_INDICES", {0: cut})
    truncated = main(["--data", str(root), "--split", "test",
                      "--fuse", "2"] + _model_arg())
    assert truncated["total_frames"] == cut
    # Dice at the traced frames is still computed on the truncated video.
    assert truncated["ed_lv_dice"]["n"] == 1
    assert 0.0 <= truncated["ed_lv_dice"]["mean"] <= 1.0
