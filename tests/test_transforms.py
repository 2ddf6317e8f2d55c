"""CAMUS transform/augmentation tests."""

import numpy as np
import pytest

from echoflow.data.transforms import (
    GaussianNoiseEcho,
    GaussianNoiseImageSequence,
    LoadSITKFromFilename,
    NormalizedImageSequence,
    ResizeImage,
    ResizeImagesAndLabels,
    ResizeTransform,
    RotateImages,
    RotateImagesAndLabels,
    RotateVideoAndLabels,
    SitkToNumpy,
    WindowImage,
    WindowImagesAndLabels,
    echo_cone_gaussian_noise,
    intensity_window,
    load_camus_sequence,
    make_camus_echo_dataset,
    one_hot_np,
    random_video_windower,
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


def test_load_sitk_and_to_numpy(tmp_path, rng):
    vol = (rng.rand(1, 12, 10) * 255).astype(np.uint8)
    vol.tofile(tmp_path / "img.raw")
    (tmp_path / "img.mhd").write_text(
        "NDims = 3\nDimSize = 10 12 1\nElementType = MET_UCHAR\n"
        "ElementDataFile = img.raw\n")
    data = {"images": [str(tmp_path / "img.mhd")]}
    data = LoadSITKFromFilename("images")(data)
    assert data["images"][0].shape == (1, 12, 10)
    normed = SitkToNumpy("images")(dict(data))
    img = normed["images"][0]
    assert img.dtype == np.float32
    assert img.min() == 0.0 and img.max() == 1.0
    labels = SitkToNumpy("images", normed=False)(dict(data))
    assert labels["images"][0].dtype == np.int64
    np.testing.assert_array_equal(labels["images"][0][0], vol[0])


def test_resize_images_and_labels(rng):
    data = {
        "images": [rng.rand(1, 24, 24).astype(np.float32)],
        "labels": [rng.randint(0, 4, (1, 24, 24)).astype(np.int64)],
    }
    out = ResizeImagesAndLabels((12, 12), "images", "labels")(data)
    assert out["images"][0].shape == (1, 12, 12)
    assert out["images"][0].dtype == np.float32
    assert out["labels"][0].shape == (12, 12)          # squeezed
    assert out["labels"][0].dtype == np.int64
    assert set(np.unique(out["labels"][0])) <= {0, 1, 2, 3}  # nearest: no new values


def test_resize_transform_and_resize_image(rng):
    img = rng.rand(1, 16, 16).astype(np.float32)
    out = ResizeTransform((8, 8), "images")({"images": [img]})
    assert out["images"][0].shape == (1, 8, 8)

    seq = rng.rand(5, 1, 16, 16).astype(np.float32)
    out = ResizeImage((8, 8), "seq", is_sequence=True)({"seq": [seq]})
    assert out["seq"][0].shape == (5, 1, 8, 8)
    lab = rng.randint(0, 3, (1, 16, 16))
    out = ResizeImage((8, 8), "labs", is_label=True)({"labs": [lab]})
    assert out["labs"][0].dtype == np.int64
    assert set(np.unique(out["labs"][0])) <= {0, 1, 2}


def test_random_video_windower_per_channel(rng):
    imgs = rng.rand(3, 16, 16).astype(np.float32) * np.array([1, 10, 100])[:, None, None]
    out = random_video_windower((0.5, 0.8), rng=rng)(imgs)
    # Each channel's range is preserved (its own min/max clip).
    for c in range(3):
        assert out[c].min() >= imgs[c].min() - 1e-4
        assert out[c].max() <= imgs[c].max() + 1e-4
    # Identity window leaves values unchanged.
    out_id = random_video_windower((1.0, 1.0), rng=rng)(imgs)
    hi_err = np.abs(out_id - imgs).max()
    assert hi_err < 1e-3


def test_window_image_sequence_roundtrip(rng):
    seq = rng.rand(1, 6, 8, 8).astype(np.float32)
    out = WindowImage((0.6, 0.9), "image_sequence", rng=rng)({"image_sequence": [seq]})
    assert out["image_sequence"][0].shape == (1, 6, 8, 8)


def test_gaussian_noise_echo_cone_masked(rng):
    img = np.zeros((1, 16, 16), np.float32)
    img[:, 4:12, 4:12] = 0.5
    out = GaussianNoiseEcho((0.1, 0.1), "images", rng=rng)({"images": [img]})
    noised = out["images"][0]
    # Outside the cone (zeros) stays exactly zero; inside actually changed.
    assert (noised[:, :4] == 0).all() and (noised[:, :, :4] == 0).all()
    assert np.abs(noised[:, 4:12, 4:12] - 0.5).max() > 1e-4
    assert noised.min() >= 0.0 and noised.max() <= 1.0


def test_rotate_images_independent(rng):
    data = {"images": [rng.rand(1, 16, 16).astype(np.float32) for _ in range(2)]}
    out = RotateImages(10.0, "uniform", "images", rng=rng)(data)
    assert out["images"][0].shape == (1, 16, 16)
    assert out["images"][0].dtype == np.float32
    lab = {"labs": [rng.randint(0, 3, (1, 16, 16))]}
    out = RotateImages(10.0, "uniform", "labs", order=0, rng=rng)(lab)
    assert out["labs"][0].dtype == np.int64
