"""Visualization: segmentation overlays and the annotated GIF the CLI emits.

Covers the reference's user-facing outputs (src/visualization_utils.py:346-538):
`echonet_overlay` draws the predicted LV on the echo frame; `make_annotated_gif`
renders overlay frames side by side with a live LV-area strip chart and
writes a GIF (PIL writer here; the reference shelled out to imagemagick).
"""

from __future__ import annotations

import numpy as np


def echonet_overlay(frame: np.ndarray, mask: np.ndarray,
                    color=(0.1, 0.9, 0.3), alpha: float = 0.35) -> np.ndarray:
    """Blend an LV mask over a grayscale/RGB frame. frame (H, W) or (H, W, 3)
    in [0, 1]; mask (H, W) {0,1}. Returns (H, W, 3) float in [0, 1]."""
    if frame.ndim == 2:
        rgb = np.stack([frame] * 3, axis=-1)
    else:
        rgb = frame.copy()
    m = mask.astype(bool)
    for c in range(3):
        rgb[..., c][m] = (1 - alpha) * rgb[..., c][m] + alpha * color[c]
    # Contour: boundary pixels fully saturated.
    from echoflow.metrics.simpson import find_boundaries_thick

    b = find_boundaries_thick(mask.astype(int)) & m
    for c in range(3):
        rgb[..., c][b] = color[c]
    return np.clip(rgb, 0, 1)


def make_annotated_gif(segmentations: np.ndarray, video: np.ndarray,
                       filename: str, fps: int = 20):
    """Write an annotated GIF: overlay on the left, LV-area curve with a
    moving cursor on the right. segmentations (L, H, W) uint8;
    video (3, L, H, W) float in [0, 1]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    length = segmentations.shape[0]
    area = segmentations.reshape(length, -1).sum(axis=1)

    frames = []
    fig, (ax_img, ax_curve) = plt.subplots(1, 2, figsize=(7, 3.2), dpi=80)
    for t in range(length):
        ax_img.clear()
        ax_curve.clear()
        ax_img.imshow(echonet_overlay(video[0, t], segmentations[t]))
        ax_img.set_title(f"frame {t}")
        ax_img.axis("off")
        ax_curve.plot(area, lw=1)
        ax_curve.axvline(t, color="r", lw=1)
        ax_curve.set_title("LV area (px)")
        fig.tight_layout()
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(Image.fromarray(buf.copy()))
    plt.close(fig)

    frames[0].save(filename, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
    return filename
