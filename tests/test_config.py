"""Config tree + profiling helper tests."""

import numpy as np

from echoflow.config import EchoflowConfig
from echoflow.utils.profiling import StepTimer


def test_defaults_match_reference_constants():
    cfg = EchoflowConfig()
    assert cfg.model.clip_length == 32
    assert cfg.model.image_size == (112, 112)
    assert cfg.train.batch_size == 4 and cfg.train.epochs == 10
    assert cfg.train.lr == 1e-4 and cfg.train.lr_after_drop == 1e-5
    assert cfg.train.lr_drop_epoch == 3
    assert cfg.ef.peak_distance == 20 and cfg.ef.prominence_scale == 0.5
    assert cfg.ef.trim_percentiles == (5, 85, 95)
    assert cfg.infer.fuse_method == "simple"


def test_flag_overrides():
    cfg = EchoflowConfig.from_flags([
        "train.lr=3e-4", "infer.num_clips=5", "model.dtype=bfloat16",
        "ef.trim_percentiles=10,80,90", "infer.interpolate_last=false",
    ])
    assert cfg.train.lr == 3e-4
    assert cfg.infer.num_clips == 5
    assert cfg.model.dtype == "bfloat16"
    assert cfg.ef.trim_percentiles == (10, 80, 90)
    assert cfg.infer.interpolate_last is False
    assert cfg.to_dict()["train"]["lr"] == 3e-4


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t.step():
            np.sum(np.ones(1000))
    s = t.summary()
    assert s["steps"] == 4 and s["mean_s"] >= 0
