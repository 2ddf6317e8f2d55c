"""Motion-field label/image propagation (warp rollouts).

Device-side equivalents of the reference's rollout helpers
(src/visualization_utils.py:58-130): chain the predicted forward/backward
motion fields to carry a frame's label (or the frame itself) through the
clip. These power both the qualitative warp-rollout evaluation (training
notebook cells 15-27) and batched motion-tracking propagation across beats
(BASELINE config 4). The chains are `lax.scan`s; batch with `jax.vmap` or a
leading N axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from echoflow.ops.warp import warp_image_with_offsets


def apply_sequence_deformation(source: jnp.ndarray, motion: jnp.ndarray,
                               start_index: int, end_index: int,
                               mode: str = "bilinear",
                               forward: bool = True) -> jnp.ndarray:
    """Chain-warp `source` (N, C, H, W) from `start_index` to `end_index`
    using forward flows (motion[:, :2, t]) or backward flows
    (motion[:, 2:, t]) — reference visualization_utils.py:107-130.
    Static indices; returns the final warped frame."""
    flows = motion[:, :2] if forward else motion[:, 2:]
    step = 1 if forward else -1
    indices = range(start_index, end_index, step)
    idx = jnp.asarray(list(indices))
    seq = jnp.moveaxis(flows, 2, 0)[idx]  # (S, N, 2, H, W)

    def body(carry, flow):
        return warp_image_with_offsets(carry, flow, mode=mode), None

    out, _ = jax.lax.scan(body, source, seq)
    return out


def deform_forback(label_ed: jnp.ndarray, label_es: jnp.ndarray,
                   motion: jnp.ndarray, mode: str = "nearest"):
    """Chained rollouts: ED carried forward through every frame, ES carried
    backward (reference get_deformed_label_forback,
    visualization_utils.py:58-80, generalized to any clip length).

    label_* (N, C, H, W); motion (N, 4, T, H, W). Returns
    (forwards (T-1, N, C, H, W), backwards (T-1, N, C, H, W)) where
    forwards[i] is the label at frame i+1 and backwards[i] at frame T-2-i.
    """
    t_len = motion.shape[2]
    fwd_flows = jnp.moveaxis(motion[:, :2, : t_len - 1], 2, 0)
    bwd_flows = jnp.moveaxis(motion[:, 2:, 1:], 2, 0)[::-1]

    def chain(carry, flow):
        nxt = warp_image_with_offsets(carry, flow, mode=mode)
        return nxt, nxt

    _, forwards = jax.lax.scan(chain, label_ed, fwd_flows)
    _, backwards = jax.lax.scan(chain, label_es, bwd_flows)
    return forwards, backwards


def deform_images_forback(images: jnp.ndarray, motion: jnp.ndarray,
                          mode: str = "bilinear"):
    """Single-step warps of every frame (reference get_deformed_image_forback,
    visualization_utils.py:83-104 — note its forward path warps each *real*
    frame once, it does not chain). images (N, C, T, H, W).

    Returns (forwards, backwards): forwards[i] = frame i warped by forward
    flow i (a prediction of frame i+1); backwards follows the reference's
    chained backward variant starting from the last frame.
    """
    t_len = images.shape[2]
    n, c = images.shape[:2]
    frames = jnp.moveaxis(images, 2, 0)  # (T, N, C, H, W)
    fwd_flows = jnp.moveaxis(motion[:, :2], 2, 0)

    forwards = jax.vmap(lambda img, fl: warp_image_with_offsets(img, fl, mode=mode))(
        frames[:-1], fwd_flows[:-1])

    bwd_flows = jnp.moveaxis(motion[:, 2:], 2, 0)[1:][::-1]

    def chain(carry, flow):
        nxt = warp_image_with_offsets(carry, flow, mode=mode)
        return nxt, nxt

    _, backwards = jax.lax.scan(chain, frames[-1], bwd_flows)
    return forwards, backwards


# Reference-named aliases (dict-based signatures normalized to arrays).
get_deformed_label_forback = deform_forback
get_deformed_image_forback = deform_images_forback
