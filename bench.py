"""Headline benchmark: full-video multi-beat segmentation throughput.

Measures the BASELINE.md headline config — 5-shift SIMPLE-fusion full-video
segmentation + per-beat EF — end to end (host video in, fused masks + EFs
out) on the default backend (one TPU chip under the driver). Prints ONE
JSON line:

    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N, ...}

`value` is the best of PASSES timed passes over the video stream: the host
has a single CPU core and the TPU is tunneled, so any concurrent host load
or tunnel hiccup halves a pass's throughput — the best pass is the
steady-state number (passes are reported in "all_passes" for scrutiny).

A second, mixed-length phase streams videos spanning several length buckets
(112..304 frames) so the bucketed-compile + per-length operand-cache design
is exercised rather than a single perfectly cached shape; its throughput is
reported as "mixed_len_fps".

Baseline: the reference segments the 1,276-video EchoNet test split in
68m46s with this config (label_fusion_compute_EF notebook cell 8) — at the
split's ~175-frame average that is ~54 frames/sec on a CUDA GPU.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FRAMES_PER_SEC = 54.1
VIDEO_FRAMES = 176
NUM_VIDEOS = 32
PASSES = 3
MIXED_LENGTHS = (112, 144, 176, 208, 256, 304)
NUM_CLIPS = 5
STEP = 1
FUSE = "simple"


def _run_stream(segmenter, videos, n_total):
    from echoflow.infer.ef import compute_ef_using_putative_clips

    t0 = time.time()
    total_frames = 0
    stream = (videos[i % len(videos)] for i in range(n_total))
    for seg in segmenter.segment_videos(stream, num_clips=NUM_CLIPS, step=STEP,
                                        fuse_method=FUSE, queue_depth=4):
        compute_ef_using_putative_clips(seg)
        total_frames += seg.shape[0]
    return total_frames / (time.time() - t0)


def _machine_matmul_tfs(chain: int = 16):
    """Measured fp32 matmul rate right now (TF/s), amortized over `chain`
    chained 4096^3 matmuls in ONE dispatch — the tunnel adds ~27 ms of
    round-trip latency per materialization, which would otherwise swamp
    the measurement (a single timed matmul reads as ~5 TF/s on a chip
    actually delivering ~70). Reported so a low bench pass is
    distinguishable from a slow framework."""
    import jax
    import jax.numpy as jnp

    a = jnp.full((4096, 4096), 1.0 / 4096.0, jnp.float32)

    @jax.jit
    def mm(a):
        y = a
        for _ in range(chain):
            y = y @ a
        return jnp.sum(y)

    float(mm(a))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(mm(a))
        best = min(best, time.perf_counter() - t0)
    return round(chain * 2 * 4096 ** 3 / best / 1e12, 1)


def main():
    import jax

    from echoflow.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from echoflow.data.synthetic import make_beating_video
    from echoflow.infer.ef import compute_ef_using_putative_clips
    from echoflow.infer.pipeline import VideoSegmenter
    from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables

    rng = jax.random.PRNGKey(0)
    model = R2Plus1DMotionSegNet()
    variables = init_variables(rng, model, (1, 3, 32, 112, 112))

    # Raw uint8 videos, as they come off the decoder: normalization happens
    # on device inside the jitted graph.
    videos = [
        make_beating_video(num_frames=VIDEO_FRAMES, period=38.0, seed=i)
        .video.astype(np.uint8)
        for i in range(4)
    ]
    mixed = [
        make_beating_video(num_frames=length, period=38.0, seed=10 + i)
        .video.astype(np.uint8)
        for i, length in enumerate(MIXED_LENGTHS)
    ]

    segmenter = VideoSegmenter(variables, forward_chunk=30)

    # Warm-up / compile (headline shape + every mixed-length bucket).
    for v in (videos[0], *mixed):
        seg = segmenter.segment_video(v, num_clips=NUM_CLIPS, step=STEP,
                                      fuse_method=FUSE)
    compute_ef_using_putative_clips(seg)

    passes = [round(_run_stream(segmenter, videos, NUM_VIDEOS), 1)
              for _ in range(PASSES)]
    fps = max(passes)
    mixed_fps = round(_run_stream(segmenter, mixed, 3 * len(mixed)), 1)

    print(json.dumps({
        "metric": "full-video 5-shift SIMPLE-fusion segmentation + EF throughput",
        "value": fps,
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_FRAMES_PER_SEC, 2),
        "all_passes": passes,
        "mixed_len_fps": mixed_fps,
        "mixed_lengths": list(MIXED_LENGTHS),
        "machine_matmul_tfs": _machine_matmul_tfs(),
    }))


if __name__ == "__main__":
    main()
