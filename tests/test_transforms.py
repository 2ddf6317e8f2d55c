"""CAMUS transform/augmentation tests."""

import numpy as np
import pytest

from echoflow.data.transforms import (
    GaussianNoiseImageSequence,
    NormalizedImageSequence,
    RotateImagesAndLabels,
    RotateVideoAndLabels,
    WindowImagesAndLabels,
    intensity_window,
    load_camus_sequence,
    make_camus_echo_dataset,
    one_hot_np,
    rotate_about_apex,
    resample_sequence_frames,
    salt_pepper,
)


def test_intensity_window_preserves_range(rng):
    img = rng.rand(32, 32).astype(np.float32) * 100
    out = intensity_window(img, (0.5, 0.8), rng)
    assert out.min() >= img.min() - 1e-4 and out.max() <= img.max() + 1e-4
    # Full-scale window is identity.
    out_id = intensity_window(img, (1.0, 1.0), rng)
    hm = np.abs(out_id - img).max()
    assert hm < 1e-3


def test_rotate_about_apex_keeps_top_center(rng):
    img = np.zeros((64, 64), np.float32)
    img[0, 32] = 1.0  # at the apex
    img[40, 32] = 1.0
    out = rotate_about_apex(img, 20.0, order=1)
    # Apex pixel stays (rotation center).
    assert out[0, 32] > 0.4
    # The distant pixel moved.
    assert out[40, 32] < 0.9
    # Label path returns integers.
    lab = (img > 0).astype(np.int64)
    out_lab = rotate_about_apex(lab, 20.0, order=0)
    assert out_lab.dtype == np.int64


def test_rotation_preserves_mass_roughly(rng):
    lab = np.zeros((64, 64), np.int64)
    lab[20:40, 25:40] = 1
    out = rotate_about_apex(lab, 10.0, order=0)
    assert abs(int(out.sum()) - int(lab.sum())) < 0.15 * lab.sum()


def test_salt_pepper_and_noise(rng):
    img = (0.5 * np.ones((50, 50))).astype(np.float32)
    img[0, 0], img[0, 1] = 0.0, 1.0  # pin range
    sp = salt_pepper(img, amount=0.2, rng=rng)
    assert (sp == 0.0).sum() > 50 and (sp == 1.0).sum() > 50
    gn = GaussianNoiseImageSequence(std=0.1, rng=rng)({"video": img})["video"]
    assert 0.05 < np.std(gn - img) < 0.15


def test_one_hot_np(rng):
    lab = rng.randint(0, 4, (8, 8))
    oh = one_hot_np(lab, 4)
    assert oh.shape == (4, 8, 8)
    np.testing.assert_array_equal(np.argmax(oh, 0), lab)


def test_dict_pipelines(rng):
    data = {
        "images": [rng.rand(32, 32).astype(np.float32) for _ in range(2)],
        "labels": [rng.randint(0, 4, (32, 32)).astype(np.int64) for _ in range(2)],
    }
    out = WindowImagesAndLabels((0.6, 0.9), rng=rng)(data)
    assert len(out["images"]) == 2
    out = RotateImagesAndLabels(15.0, rng=rng)(out)
    assert out["labels"][0].dtype == np.int64

    vdata = {"video": rng.rand(6, 32, 32).astype(np.float32) * 50,
             "label_ED": (rng.rand(32, 32) > 0.5).astype(np.int64),
             "label_ES": (rng.rand(32, 32) > 0.5).astype(np.int64)}
    out = RotateVideoAndLabels(10.0, rng=rng)(vdata)
    assert out["video"].shape == (6, 32, 32)
    out = NormalizedImageSequence("pmone")(out)
    assert -1.0 - 1e-6 <= out["video"].min() and out["video"].max() <= 1.0 + 1e-6


def test_resample_sequence_frames(rng):
    video = rng.rand(17, 8, 8).astype(np.float32)
    out = resample_sequence_frames(video, 10)
    assert out.shape == (10, 8, 8)


def test_camus_directory_walker(tmp_path, rng):
    # Build a fake CAMUS patient dir.
    pdir = tmp_path / "patient0001"
    pdir.mkdir()
    (pdir / "Info_2CH.cfg").write_text("ED: 1\nES: 12\nNbFrame: 20\n")
    vol = (rng.rand(20, 16, 16) * 255).astype(np.uint8)
    vol.tofile(pdir / "patient0001_2CH_sequence.raw")
    (pdir / "patient0001_2CH_sequence.mhd").write_text(
        "NDims = 3\nDimSize = 16 16 20\nElementType = MET_UCHAR\n"
        "ElementDataFile = patient0001_2CH_sequence.raw\n")

    ds = make_camus_echo_dataset(str(tmp_path))
    assert "patient0001" in ds and "2CH" in ds["patient0001"]
    assert ds["patient0001"]["2CH"]["sequence"].endswith("::ED_first")

    seq = load_camus_sequence(ds["patient0001"]["2CH"]["sequence"], num_frames=10)
    assert seq.shape == (10, 16, 16)
    assert 0.0 <= seq.min() and seq.max() <= 1.0
