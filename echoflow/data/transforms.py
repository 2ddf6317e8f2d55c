"""CAMUS-era data transforms and augmentations.

Host-side equivalents of reference src/utils/camus_transforms.py:46-805 and
src/transform_utils.py:40-486: intensity windowing, rotation about the
transducer apex (top-center of the sector), Gaussian/speckle noise, salt &
pepper, one-hot, sequence loading/resampling, and the CAMUS directory
walker. Functional core + thin dict-pipeline classes mirroring the
reference's transform API (each class maps a data dict -> data dict).
"""

from __future__ import annotations

import os
import re

import numpy as np


# ------------------------------------------------------------ functional core

def intensity_window(img: np.ndarray, scale_range=(1.0, 1.0),
                     rng: np.random.RandomState | None = None) -> np.ndarray:
    """Random intensity windowing (reference random_Windower,
    camus_transforms.py:249-279): map a random sub-range of the intensity
    range to the full range and clip the complement."""
    rng = rng or np.random
    lo_s, hi_s = sorted(scale_range)
    assert 0.0 < lo_s <= hi_s <= 1.0, "scale range must be in (0, 1]"
    im_min, im_max = img.min(), img.max()
    sc = lo_s + (hi_s - lo_s) * rng.rand()
    im_range = im_max - im_min
    locut = im_min + im_range * ((1.0 - sc) * rng.rand())
    hicut = locut + sc * im_range
    alpha = (img - locut) / (hicut - locut)
    return np.clip((1.0 - alpha) * im_min + alpha * im_max, im_min, im_max)


def rotate_about_apex(img: np.ndarray, degrees: float, order: int = 1) -> np.ndarray:
    """Rotate (H, W) or (C, H, W) about the ultrasound apex at top-center
    — xy center (w/2 - 0.5, 0.5) — counterclockwise for positive degrees
    (reference random_Rotater, camus_transforms.py:471-522). order 0 =
    nearest (labels), 1 = linear (images)."""
    import cv2

    arr = np.asarray(img)
    squeeze = arr.ndim == 2
    planes = arr[None] if squeeze else arr
    h, w = planes.shape[-2:]
    center = (w / 2.0 - 0.5, 0.5)
    mat = cv2.getRotationMatrix2D(center, degrees, 1.0)
    interp = cv2.INTER_NEAREST if order == 0 else cv2.INTER_LINEAR
    out = np.stack([
        cv2.warpAffine(p.astype(np.float32), mat, (w, h), flags=interp,
                       borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
        for p in planes
    ])
    out = out[0] if squeeze else out
    return out.astype(np.int64) if order == 0 else out.astype(np.float32)


def random_rotation_angle(scale: float, rtype: str = "uniform",
                          rng: np.random.RandomState | None = None) -> float:
    """Random angle: uniform in [-scale, scale] or normal(0, scale) clipped
    to +-3*scale (reference camus_transforms.py:484-490)."""
    rng = rng or np.random
    if rtype == "normal":
        return float(np.clip(scale * rng.randn(), -3 * scale, 3 * scale))
    return float(2.0 * scale * rng.rand() - scale)


def gaussian_noise(img: np.ndarray, std: float,
                   rng: np.random.RandomState | None = None) -> np.ndarray:
    rng = rng or np.random
    return (img + std * rng.randn(*img.shape)).astype(np.float32)


def salt_pepper(img: np.ndarray, amount: float = 0.01,
                rng: np.random.RandomState | None = None) -> np.ndarray:
    """Salt & pepper on the image's own intensity range
    (reference AddSaltPepper, camus_transforms.py:731-759)."""
    rng = rng or np.random
    out = img.copy()
    lo, hi = img.min(), img.max()
    mask = rng.rand(*img.shape)
    out[mask < amount / 2] = lo
    out[mask > 1 - amount / 2] = hi
    return out


def one_hot_np(label: np.ndarray, num_classes: int) -> np.ndarray:
    """(H, W) int -> (num_classes, H, W) float32
    (reference OneHot, camus_transforms.py:761-797)."""
    return np.stack([(label == k) for k in range(num_classes)]).astype(np.float32)


def resample_sequence_frames(video: np.ndarray, num_frames: int,
                             align_corners: bool = True) -> np.ndarray:
    """Trilinear time-resample of a (T, H, W) sequence (reference
    LoadImageSequenceToNumpy resamples CAMUS sequences to 10 frames)."""
    import jax.numpy as jnp

    from echoflow.ops.resize import resize_linear

    return np.asarray(resize_linear(jnp.asarray(video.astype(np.float32)), 0,
                                    num_frames, align_corners))


# ------------------------------------------------------ dict-pipeline classes

class IdentityTransform:
    def __call__(self, data):
        return data


class WindowImagesAndLabels:
    """Intensity windowing of data['images']; labels untouched
    (reference camus_transforms.py:281-366)."""

    def __init__(self, scale=(1.0, 1.0), image_field="images", label_field="labels",
                 rng=None):
        self.scale = scale
        self.image_field = image_field
        self.rng = rng

    def __call__(self, data):
        data = dict(data)
        value = data[self.image_field]
        if isinstance(value, (list, tuple)):
            data[self.image_field] = [
                intensity_window(img, self.scale, self.rng) for img in value]
        else:  # a single image/stack: window it as one unit
            data[self.image_field] = intensity_window(
                np.asarray(value), self.scale, self.rng)
        return data


class RotateImagesAndLabels:
    """Same random apex rotation applied to each (image, label) pair
    (reference camus_transforms.py:524-652)."""

    def __init__(self, scale=10.0, rtype="uniform", image_field="images",
                 label_field="labels", rng=None):
        self.scale = scale
        self.rtype = rtype
        self.image_field = image_field
        self.label_field = label_field
        self.rng = rng

    def __call__(self, data):
        data = dict(data)
        imgs = data[self.image_field]
        labs = data[self.label_field]
        if isinstance(imgs, (list, tuple)):
            images, labels = [], []
            for img, lab in zip(imgs, labs):
                angle = random_rotation_angle(self.scale, self.rtype, self.rng)
                images.append(rotate_about_apex(img, angle, order=1))
                labels.append(rotate_about_apex(lab, angle, order=0))
            data[self.image_field] = images
            data[self.label_field] = labels
        else:  # single (C, H, W)/(H, W) image with its (H, W) label
            angle = random_rotation_angle(self.scale, self.rtype, self.rng)
            data[self.image_field] = rotate_about_apex(np.asarray(imgs), angle, order=1)
            data[self.label_field] = rotate_about_apex(np.asarray(labs), angle, order=0)
        return data


class RotateVideoAndLabels:
    """One random angle for the whole video plus its ED/ES labels
    (reference transform_utils.py:324-388)."""

    def __init__(self, scale=10.0, rtype="uniform", video_field="video",
                 label_fields=("label_ED", "label_ES"), rng=None):
        self.scale = scale
        self.rtype = rtype
        self.video_field = video_field
        self.label_fields = label_fields
        self.rng = rng

    def __call__(self, data):
        data = dict(data)
        angle = random_rotation_angle(self.scale, self.rtype, self.rng)
        video = np.asarray(data[self.video_field])
        data[self.video_field] = np.stack(
            [rotate_about_apex(f, angle, order=1) for f in video])
        for field in self.label_fields:
            data[field] = rotate_about_apex(np.asarray(data[field]), angle, order=0)
        return data


class GaussianNoiseImageSequence:
    """Additive Gaussian noise on a video sequence
    (reference transform_utils.py:391-414)."""

    def __init__(self, std=0.02, video_field="video", rng=None):
        self.std = std
        self.video_field = video_field
        self.rng = rng

    def __call__(self, data):
        data = dict(data)
        data[self.video_field] = gaussian_noise(
            np.asarray(data[self.video_field], np.float32), self.std, self.rng)
        return data


class NormalizedImageSequence:
    """[0,1] or [-1,1] normalization of a sequence
    (reference transform_utils.py:417-441)."""

    def __init__(self, mode="zeroone", video_field="video"):
        assert mode in ("zeroone", "pmone")
        self.mode = mode
        self.video_field = video_field

    def __call__(self, data):
        data = dict(data)
        v = np.asarray(data[self.video_field], np.float32)
        v = (v - v.min()) / (v.max() - v.min())
        if self.mode == "pmone":
            v = 2.0 * v - 1.0
        data[self.video_field] = v
        return data


# --------------------------------------------------------- CAMUS directory

def make_camus_echo_dataset(root: str, views=("2CH", "4CH")) -> dict:
    """Walk CAMUS `patientNNNN/` dirs, parse `Info_{view}.cfg` for the
    ED/ES frame order, and emit per-patient dicts of sequence paths with an
    order tag appended (reference transform_utils.py:444-486)."""
    dataset = {}
    for entry in sorted(os.listdir(root)):
        pdir = os.path.join(root, entry)
        if not (os.path.isdir(pdir) and re.match(r"patient\d+", entry)):
            continue
        record = {}
        for view in views:
            cfg_path = os.path.join(pdir, f"Info_{view}.cfg")
            if not os.path.exists(cfg_path):
                continue
            info = {}
            with open(cfg_path) as f:
                for line in f:
                    if ":" in line:
                        k, v = line.split(":", 1)
                        info[k.strip()] = v.strip()
            ed = int(info.get("ED", 1))
            es = int(info.get("ES", 2))
            order = "ED_first" if ed < es else "ES_first"
            seq = os.path.join(pdir, f"{entry}_{view}_sequence.mhd")
            record[view] = {
                "sequence": f"{seq}::{order}",
                "ED": os.path.join(pdir, f"{entry}_{view}_ED.mhd"),
                "ED_gt": os.path.join(pdir, f"{entry}_{view}_ED_gt.mhd"),
                "ES": os.path.join(pdir, f"{entry}_{view}_ES.mhd"),
                "ES_gt": os.path.join(pdir, f"{entry}_{view}_ES_gt.mhd"),
                "info": info,
            }
        if record:
            dataset[entry] = record
    return dataset


def load_camus_sequence(tagged_path: str, num_frames: int = 10,
                        norm: str = "zeroone") -> np.ndarray:
    """Read a CAMUS .mhd sequence (path possibly tagged `::ES_first`),
    reverse to ED-first if needed, normalize, and time-resample to
    `num_frames` (reference LoadImageSequenceToNumpy,
    transform_utils.py:40-112)."""
    from echoflow.utils.echo_io import read_mhd

    path, _, order = tagged_path.partition("::")
    video = read_mhd(path).astype(np.float32)
    if order == "ES_first":
        video = video[::-1].copy()
    video = (video - video.min()) / (video.max() - video.min())
    if norm == "pmone":
        video = 2.0 * video - 1.0
    if video.shape[0] != num_frames:
        video = resample_sequence_frames(video, num_frames)
    return video
