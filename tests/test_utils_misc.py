"""Metrics logger + multi-host sharding helper tests."""

import json

import numpy as np

from echoflow.parallel.mesh import host_shard_indices
from echoflow.utils.metrics_log import MetricsLogger


def test_jsonl_logger(tmp_path):
    log = MetricsLogger(str(tmp_path / "m.jsonl"))
    log.log(1, {"loss": 2.5, "dice": np.float32(0.9)})
    log.log(2, {"loss": 2.0, "dice": 0.92})
    rows = log.read()
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[0]["loss"] == 2.5
    # file is valid JSONL
    with open(tmp_path / "m.jsonl") as f:
        for line in f:
            json.loads(line)


def test_csv_logger(tmp_path):
    log = MetricsLogger(str(tmp_path / "m.csv"), fmt="csv")
    log.log(0, {"loss": 1.0})
    log.log(1, {"loss": 0.5})
    rows = log.read()
    assert len(rows) == 2 and float(rows[1]["loss"]) == 0.5


def test_host_shard_indices():
    # 10 items over 3 hosts: ceil-chunked contiguous slices, full coverage.
    slices = [host_shard_indices(10, i, 3) for i in range(3)]
    flat = [i for s in slices for i in s]
    assert flat == list(range(10))
    assert list(slices[0]) == [0, 1, 2, 3]
    assert list(slices[2]) == [8, 9]
    # more hosts than items: trailing hosts get empty ranges
    assert list(host_shard_indices(2, 3, 4)) == []


def test_top_level_contract_api_reexports():
    """SURVEY.md §7.4 contract: the reference's library surface is importable
    from the top-level package (lazy re-exports in echoflow/__init__.py)."""
    import echoflow

    for name in ("segment_a_video_with_fusion", "divide_to_consecutive_clips",
                 "compute_ef_using_putative_clips", "EDESpairs", "get2dPucks",
                 "computeSimpsonVolume", "zeroone_normalizer",
                 "VideoSegmenter"):
        assert callable(getattr(echoflow, name)), name
    try:
        echoflow.definitely_not_an_api
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass
