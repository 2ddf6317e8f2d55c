"""Intensity normalization and one-hot encoding.

Matches reference src/echonet_dataset.py:38-50 (`zeroone_normalizer`: per-RGB-
channel min/max over the *whole* video) and src/loss_functions.py:123-134
(`convert_to_1hot`: (N, 1, H, W) int labels -> (N, C, H, W) one-hot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def zeroone_normalize(image_data: jnp.ndarray) -> jnp.ndarray:
    """Per-channel [0, 1] normalization; channel axis is axis 0.

    Input shape (3, ...) — typically (3, T, H, W). Device-side equivalent of
    the reference's `zeroone_normalizer` (src/echonet_dataset.py:38-50).
    """
    c = image_data.shape[0]
    flat = image_data.reshape(c, -1)
    lo = jnp.min(flat, axis=1, keepdims=True)
    flat = flat - lo
    hi = jnp.max(flat, axis=1, keepdims=True)
    flat = flat / hi
    return flat.reshape(image_data.shape)


def zeroone_normalizer(image_data: np.ndarray) -> np.ndarray:
    """Host/numpy version, identical contract to the reference function
    (including in-place mutation of float inputs)."""
    norm = image_data
    shape = norm.shape
    norm = norm.reshape(3, -1)
    norm -= np.min(norm, axis=1).reshape(3, 1)
    norm /= np.max(norm, axis=1).reshape(3, 1)
    return norm.reshape(shape)


def one_hot_channels(label: jnp.ndarray, num_classes: int, dtype=jnp.float32) -> jnp.ndarray:
    """(N, 1, H, W) integer labels -> (N, num_classes, H, W) one-hot float.

    Reference `convert_to_1hot` (src/loss_functions.py:123-134).
    """
    lab = label.astype(jnp.int32)[:, 0]  # (N, H, W)
    return jax.nn.one_hot(lab, num_classes, axis=1, dtype=dtype)
