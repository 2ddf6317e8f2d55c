"""Data layer tests on synthetic EchoNet-format fixtures."""

import numpy as np
import pytest

from echoflow.data.echonet import (
    EchoNetDynamicDataset,
    EchoNetIndex,
    get_mean_and_std,
    random_start_and_end,
    rasterize_trace,
)
from echoflow.data.fixtures import make_synthetic_echonet_root
from echoflow.data.synthetic import make_training_sample
from echoflow.metrics.dice import lv_dice


@pytest.fixture(scope="module")
def echonet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("echonet")
    make_synthetic_echonet_root(root, n_videos=3, num_frames=80)
    return str(root)


def test_index_and_traces(echonet_root):
    index = EchoNetIndex(echonet_root)
    assert len(index.file_list) == 3
    train = index.split("train")
    assert len(train) == 1
    fname = train.iloc[0]["FileName"]
    large, small, lmask, smask = index.traced_frames(fname, (112, 112))
    assert lmask.sum() > smask.sum() > 0  # ED mask bigger than ES
    assert large != small


def test_trace_rasterization_matches_ellipse():
    # A traced ellipse should rasterize to ~the analytic ellipse mask.
    from echoflow.data.fixtures import _ellipse_chords

    chords = _ellipse_chords(56, 56, 32, 20, n_chords=20)
    mask = rasterize_trace(chords, (112, 112))
    yy, xx = np.mgrid[0:112, 0:112]
    truth = (((yy - 56) / 32) ** 2 + ((xx - 56) / 20) ** 2 <= 1).astype(np.uint8)
    assert lv_dice(mask, truth) > 0.93


def test_mean_and_std(echonet_root):
    index = EchoNetIndex(echonet_root)
    mean, std = get_mean_and_std(index, "train")
    assert mean.shape == (3,) and std.shape == (3,)
    assert np.all(std > 0) and np.all(mean > 0)


def test_dataset_clip_mode(echonet_root):
    ds = EchoNetDynamicDataset(echonet_root, split="train", clip_length=32, seed=0)
    video, targets = ds[0]
    (filename, ef, es_ci, ed_ci, es_i, ed_i, es_frame, ed_frame, es_lab, ed_lab) = targets
    assert video.shape == (3, 32, 112, 112)
    assert video.min() >= 0 and video.max() <= 1
    assert 0 <= ed_ci < es_ci <= 31
    assert ed_lab.sum() > es_lab.sum() > 0
    assert 0 < ef < 100


def test_dataset_full_mode(echonet_root):
    ds = EchoNetDynamicDataset(echonet_root, split="test", clip_length="full",
                               raise_for_es_ed=False, seed=0)
    video, targets = ds[0]
    assert video.shape[1] == 80
    ed_ci, es_ci = targets[3], targets[2]
    assert targets[4] == es_ci and targets[5] == ed_ci  # full mode: clip==video idx


def test_random_start_and_end_properties():
    rng = np.random.RandomState(0)
    for _ in range(200):
        ed = rng.randint(0, 60)
        es = ed + rng.randint(1, 40)
        vlen = es + rng.randint(1, 40)
        try:
            start, end = random_start_and_end(ed, es, vlen, 32, rng)
        except ValueError:
            # The reference's randint raises when low == high; its dataset
            # catches this and falls back (echonet_dataset.py:124-130).
            continue
        if 32 > vlen:
            assert (start, end) == (ed, es + 1)
        elif es - ed + 1 >= 32:
            assert start == ed
        else:
            assert start <= ed and es < end and end - start == 32
            assert end <= vlen
    with pytest.raises(AssertionError):
        random_start_and_end(10, 5, 100)


def test_training_sample_fixture():
    s = make_training_sample(seed=1)
    assert s["video"].shape == (3, 32, 112, 112)
    assert 0 <= s["ed_idx"] < s["es_idx"] <= 31
    assert s["ed_label"].sum() > s["es_label"].sum()


def test_pinned_fold_fixtures_load():
    """The reference's pinned train/val subsets (fold_indexes/, data
    fixtures copied verbatim: 7,332 train / 1,258 valid indices) load via
    load_fold_indices — the `--folds fold_indexes` path of train_clasfv."""
    import os

    from echoflow.data.echonet import load_fold_indices

    root = os.path.join(os.path.dirname(__file__), "..", "fold_indexes")
    train = load_fold_indices(os.path.join(root, "stanford_train_sampled_indices"))
    valid = load_fold_indices(os.path.join(root, "stanford_valid_sampled_indices"))
    assert len(train) == 7332 and len(valid) == 1258
    assert all(isinstance(i, int) for i in train[:32])
    assert len(set(train)) == len(train) and len(set(valid)) == len(valid)
