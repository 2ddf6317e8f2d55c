"""Batched raw clip inference for the clip-study surfaces.

The reference's clip-study notebooks
(`echonet_dynamic_test_dataset_consecutive_clips.ipynb`,
`echonet_dynamic_test_dataset_ed_or_es_only_clips.ipynb`) forward one clip
at a time in Python loops (batch 1, `model(torch.Tensor(one_clip))`), which
is the single biggest throughput loss the TPU build removes (SURVEY.md
§2.4 item 4). Here every start point's clip goes through ONE chunked,
jitted forward: the clip batch is an array axis, `lax.map` bounds peak
activation memory, and the XLA graph is compiled once per (chunk, H, W)
shape.

Unlike the fused `VideoSegmenter` graph (infer/pipeline.py), this path
returns the raw per-clip outputs (seg softmax and motion fields) that the
studies plot and analyze, not a fused label video.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from echoflow.models.r2plus1d import R2Plus1DMotionSegNet

CLIP_LEN = 32


@dataclass
class ClipForward:
    """Chunked batched forward over arbitrary clip stacks.

    Parameters mirror `VideoSegmenter`: BN is folded for inference, the
    weights are pinned on device once, and `forward_chunk` clips are
    forwarded per `lax.map` step.
    """

    variables: dict
    dtype: object = jnp.float32
    forward_chunk: int = 8
    fold_bn: bool = True
    with_motion: bool = True
    _compiled: dict = field(default_factory=dict, init=False, repr=False)

    def __post_init__(self):
        import threading

        # Once-guard lock for _compiled (same discipline as VideoSegmenter:
        # concurrent first calls for one shape share a single compile).
        self._lock = threading.Lock()
        if self.fold_bn:
            # Variables without batch_stats are taken as already folded
            # (same convention as VideoSegmenter).
            if "batch_stats" in self.variables:
                from echoflow.models.fold_bn import fold_variables

                self.variables = fold_variables(self.variables)
            self._model = R2Plus1DMotionSegNet(dtype=self.dtype, folded=True)
        else:
            self._model = R2Plus1DMotionSegNet(dtype=self.dtype)
        self.variables = jax.tree.map(jnp.asarray, self.variables)

    def _graph(self, n_chunks: int, chunk: int, h: int, w: int):
        key = (n_chunks, chunk, h, w)
        from echoflow.utils.concurrency import get_or_build

        return get_or_build(self._compiled, self._lock, key,
                            lambda: self._build_graph(n_chunks, chunk, h, w))

    def _build_graph(self, n_chunks: int, chunk: int, h: int, w: int):
        model = self._model
        with_motion = self.with_motion
        folded = self.fold_bn

        @jax.jit
        def run(variables, clips):
            def fwd(xs):
                if folded:
                    # Same einsum fast path as the fusion engine (dead
                    # heads eliminated, single W-contraction decoder);
                    # bit-identical to model.apply on folded variables.
                    from echoflow.models.fast_forward import folded_forward

                    seg, motion = folded_forward(
                        variables, xs, dtype=self.dtype, pallas=False,
                        with_motion=with_motion)
                else:
                    seg, motion = model.apply(variables, xs, train=False)
                probs = jax.nn.softmax(seg, axis=1)
                return (probs, motion) if with_motion else (probs,)

            out = jax.lax.map(fwd, clips)
            return tuple(o.reshape(-1, *o.shape[2:]) for o in out)

        return run

    def __call__(self, clips: np.ndarray):
        """clips: (N, 3, 32, H, W) float in [0, 1]. Returns
        (seg_probs (N, 2, 32, H, W), motion (N, 4, 32, H, W)) — or just
        (seg_probs,) when constructed with `with_motion=False`."""
        clips = np.asarray(clips, np.float32)
        n, _, t, h, w = clips.shape
        if n == 0:
            outs = (np.zeros((0, 2, t, h, w), np.float32),)
            if self.with_motion:
                outs += (np.zeros((0, 4, t, h, w), np.float32),)
            return outs
        chunk = min(self.forward_chunk, n)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        if pad:
            clips = np.concatenate(
                [clips, np.zeros((pad, *clips.shape[1:]), clips.dtype)])
        xs = clips.reshape(n_chunks, chunk, 3, t, h, w)
        out = self._graph(n_chunks, chunk, h, w)(self.variables, jnp.asarray(xs))
        return tuple(np.asarray(o)[:n] for o in out)

    def segment_start_points(self, video: np.ndarray, starts,
                             clip_length: int = CLIP_LEN):
        """Forward the clip at every start point in one batch.

        video: (3, L, H, W) float in [0, 1]. Returns (segmentations
        (S, 32, H, W) uint8 argmax labels, seg_probs, motion) — the arrays
        the study notebooks derive every plot from (consecutive-clips
        notebook cells 9-10; ed/es-only notebook cells 9-10)."""
        starts = np.asarray(starts, np.int64)
        if starts.size == 0:
            # e.g. a systole exactly clip_length long has no covering
            # window (infer/ef.py start-point helpers return empty).
            c, _, h, w = video.shape
            empty = lambda ch: np.zeros((0, ch, clip_length, h, w), np.float32)
            outs = (empty(2),) if not self.with_motion else (empty(2), empty(4))
            return (np.zeros((0, clip_length, h, w), np.uint8), *outs)
        clips = np.stack([video[:, s:s + clip_length] for s in starts])
        out = self(clips)
        labels = np.argmax(out[0], axis=1).astype(np.uint8)
        return (labels, *out)
