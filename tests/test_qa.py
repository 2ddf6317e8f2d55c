"""Dataset QA surface tests (reference echonet_dynamic_meta.ipynb audits)."""

import numpy as np
import pandas as pd
import pytest

from echoflow.data.echonet import EchoNetIndex
from echoflow.data.fixtures import make_synthetic_echonet_root
from echoflow.data.qa import (
    EXPECTED_TRACE_ROWS,
    clips_per_video_stats,
    find_multi_trace_videos,
    qa_report,
    systole_length_stats,
    trace_order_mismatches,
)


@pytest.fixture(scope="module")
def es_first_root(tmp_path_factory):
    """EchoNet fixture following the real dataset's systolic-trace-first
    file order, with one video's tracings deliberately malformed."""
    root = tmp_path_factory.mktemp("echonet_qa")
    make_synthetic_echonet_root(root, n_videos=3, num_frames=80,
                                trace_file_order="es_first")
    # Malform video 0: append a third traced frame with 3 chords.
    vt = pd.read_csv(root / "VolumeTracings.csv")
    bad = vt.iloc[:3].copy()
    bad["Frame"] = 70
    bad["FileName"] = "synth0000.avi"
    pd.concat([vt, bad]).to_csv(root / "VolumeTracings.csv", index=False)
    return str(root)


def test_find_multi_trace_videos(es_first_root):
    index = EchoNetIndex(es_first_root)
    flagged = find_multi_trace_videos(index)
    assert set(flagged) == {"synth0000.avi"}
    info = flagged["synth0000.avi"]
    assert len(info["frames"]) == 3
    assert sum(info["counts"]) != EXPECTED_TRACE_ROWS


def test_file_order_parity_mode(es_first_root):
    """order='file' must follow the echonet package convention (systolic
    first, diastolic last) regardless of frame numbers or areas."""
    index = EchoNetIndex(es_first_root)
    fname = "synth0001.avi"
    ed_a, es_a, lmask, smask = index.traced_frames(fname, (112, 112), order="area")
    ed_f, es_f, lmask_f, smask_f = index.traced_frames(fname, (112, 112), order="file")
    # On a well-formed es-first file the two conventions agree.
    assert (ed_a, es_a) == (ed_f, es_f)
    np.testing.assert_array_equal(lmask, lmask_f)
    assert lmask.sum() > smask.sum()


def test_trace_order_mismatch_detection(tmp_path):
    """An ed-first tracings file (violating the echonet convention) must be
    flagged: file order would assign the big trace to ES."""
    root = make_synthetic_echonet_root(tmp_path, n_videos=2, num_frames=80,
                                       trace_file_order="ed_first")
    index = EchoNetIndex(str(root))
    mismatched = trace_order_mismatches(index)
    assert len(mismatched) == 2  # every video violates the convention
    # And order='file' indeed swaps ED/ES relative to order='area'.
    fname = mismatched[0]
    ed_a, es_a, _, _ = index.traced_frames(fname, (112, 112), order="area")
    ed_f, es_f, _, _ = index.traced_frames(fname, (112, 112), order="file")
    assert (ed_f, es_f) == (es_a, ed_a)


def test_systole_and_clip_stats(es_first_root):
    index = EchoNetIndex(es_first_root)
    stats = systole_length_stats(index, "train")
    assert stats["n"] >= 1
    assert stats["mean"] is not None and stats["mean"] > 0
    clips = clips_per_video_stats(index, "test")
    assert clips["mean_clips"] == pytest.approx(np.round(80 / 32), abs=1e-9)


def test_qa_report_shape(es_first_root):
    report = qa_report(es_first_root, split="train")
    assert "multi_trace_videos" in report
    assert "synth0000.avi" in report["multi_trace_videos"]
    assert report["known_bad"]["unreadable"] == ["0X5DD5283AC43CCDD1.avi"]
    assert report["systole_length"]["n"] >= 1
