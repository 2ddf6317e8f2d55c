"""Selective mixed-precision study (VERDICT r2 item 3).

Measures, with the trained synthetic checkpoint, how each inference dtype
policy trades mask fidelity for throughput on the headline config (5-shift
SIMPLE fusion):

  - fp32   : everything float32 (the parity default)
  - mixed  : bf16 conv backbone, fp32 decoder einsums + heads
             (`VideoSegmenter(backbone_dtype=bf16)`) — the backbone is ~55%
             of forward FLOPs and all MXU conv work; the decoder, where the
             argmax-deciding logit margins form, stays fp32
  - bf16   : everything bfloat16 (the round-2 fast path, parked outside the
             parity bar at LV Dice 0.997)

For each policy: ED/ES-frame LV Dice vs the synthetic ground truth, LV Dice
and pixel agreement vs the fp32 policy's masks, and stream throughput.

Decision rule — stated precisely (round-3 advisor finding): the BASELINE.md
accuracy bar ("LV Dice within 0.001 of the reference") is measured against
clinical traces, i.e. it is a GROUND-TRUTH-accuracy bar — the reference's
own 0.9354 ED Dice is a Dice-vs-traces number, and a mask-vs-reference-mask
comparison isn't even measurable here (checkpoint gated). So a policy may
become the ENGINE default only if `gt_dice_delta` (its ground-truth ED/ES
Dice minus fp32's) is <= 0.001. Mask-vs-fp32 fidelity (`lv_dice_vs_fp32`,
`pixel_agree_vs_fp32`) is reported so the non-identity is explicit — bf16
flips ~0.08% of pixels vs fp32 — and the identical-masks promise lives on
a separate surface: the CLI defaults to --precision fp32 (the reference
parity path), and `dtype=jnp.float32` pins the engine.

Usage: python benchmarks/run_precision_study.py [--videos N] [--model PATH]
Writes benchmarks/precision_study.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def lv_dice(a: np.ndarray, b: np.ndarray, eps: float = 1e-7) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    return float((2 * (a * b).sum() + eps) / (a.sum() + b.sum() + eps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--frames", type=int, default=176)
    ap.add_argument("--model", type=str,
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "save_models", "synthetic_clasfv.pkl"))
    ap.add_argument("--out", type=str,
                    default=os.path.join(os.path.dirname(__file__),
                                         "precision_study.json"))
    args = ap.parse_args()

    import jax.numpy as jnp

    from echoflow.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from echoflow.data.synthetic import make_beating_video
    from echoflow.infer.pipeline import VideoSegmenter
    from echoflow.train.checkpoint import load_model_variables

    variables = load_model_variables(args.model)
    beats = [make_beating_video(num_frames=args.frames, period=38.0, seed=i)
             for i in range(args.videos)]
    videos = [b.video.astype(np.uint8) for b in beats]

    policies = {
        "fp32": dict(dtype=jnp.float32),
        "mixed": dict(dtype=jnp.float32, backbone_dtype=jnp.bfloat16),
        "bf16": dict(dtype=jnp.bfloat16),
    }

    masks = {}
    results = {}
    for name, kw in policies.items():
        seg = VideoSegmenter(variables, forward_chunk=30, **kw)
        # compile
        seg.segment_video(videos[0], num_clips=5, step=1, fuse_method="simple")
        t0 = time.time()
        outs = list(seg.segment_videos(videos, num_clips=5, step=1,
                                       fuse_method="simple", queue_depth=4))
        dt = time.time() - t0
        masks[name] = outs
        fps = sum(o.shape[0] for o in outs) / dt

        # ED/ES-frame LV Dice vs synthetic ground truth.
        gt_dices = []
        for beat, out in zip(beats, outs):
            for fr in np.concatenate([np.atleast_1d(beat.ed_frames),
                                      np.atleast_1d(beat.es_frames)]):
                fr = int(fr)
                if fr < out.shape[0]:
                    gt_dices.append(lv_dice(out[fr], beat.masks[fr]))
        results[name] = {"fps": round(fps, 1),
                         "gt_edes_dice": round(float(np.mean(gt_dices)), 4)}

    for name in policies:
        agree = np.mean([
            (a == b).mean() for a, b in zip(masks[name], masks["fp32"])])
        vs_dice = np.mean([
            lv_dice(a, b) for a, b in zip(masks[name], masks["fp32"])])
        results[name]["pixel_agree_vs_fp32"] = round(float(agree), 6)
        results[name]["lv_dice_vs_fp32"] = round(float(vs_dice), 4)
        # Ground-truth accuracy delta — the decision-gate metric (named so
        # the artifact can't be misread as a mask-vs-fp32 parity claim).
        results[name]["gt_dice_delta"] = round(
            results["fp32"]["gt_edes_dice"] - results[name]["gt_edes_dice"], 4)

    header = f"{'policy':8} {'fps':>8} {'EDES dice':>10} {'vs fp32 dice':>13} {'agree':>9} {'gt delta':>9}"
    print(header)
    for name, r in results.items():
        print(f"{name:8} {r['fps']:>8} {r['gt_edes_dice']:>10} "
              f"{r['lv_dice_vs_fp32']:>13} {r['pixel_agree_vs_fp32']:>9} "
              f"{r['gt_dice_delta']:>9}")

    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
