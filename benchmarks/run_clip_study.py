"""Clip-study driver: the two clip-study notebooks as one real entry point.

Reproduces, as library-driven studies with JSON (and optional PNG) output:

* ``--study consecutive`` — the per-patient consecutive-clip walkthrough
  (`echonet_dynamic_test_dataset_consecutive_clips.ipynb`): every ED->ES
  covering start point forwarded as ONE device batch -> per-start LV-area
  curves (cells 9-14); consecutive-clip full-video segmentation -> LV-area
  curve with clip cut points, ED/ES dice vs ground truth, peak-picked
  ED/ES pairs and per-beat Simpson EF vs the trace-derived EF
  (cells 16-33).

* ``--study ed_es_only`` — the ED-only / ES-only clip study + the first
  fusion prototype (`echonet_dynamic_test_dataset_ed_or_es_only_clips.ipynb`):
  start-point clouds around ED alone and ES alone (cells 7-21), the ED->ES
  cloud (cells 23-31), the per-frame Simpson-volume curve (cell 47), and
  the shift-augmentation prototype — 5 time-shifted copies segmented
  independently, per-shift LV curves and per-shift ED/ES dice
  (cells 61-70) — which is the idea the production fusion engine batches.

Where the notebooks loop `model(one_clip)` at batch 1, this driver uses
`ClipForward` (all start points in one chunked jitted forward) and the
`VideoSegmenter` engine (whole-video segmentation in one graph) — the
TPU-native replacements for those loops.

Runs on a synthetic beating video by default (EchoNet-Dynamic is gated);
`--video x.avi` studies a real echo instead (no ground-truth overlays).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--study", choices=("consecutive", "ed_es_only"),
                    default="consecutive")
    ap.add_argument("--video", default=None, help="AVI path (default: synthetic)")
    ap.add_argument("--checkpoint", default=None,
                    help="echoflow .ckpt or reference .pth (default: fresh init)")
    ap.add_argument("--frames", type=int, default=176)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="write JSON (and plots) here")
    ap.add_argument("--plots", action="store_true",
                    help="also write the notebook's figures as PNGs")
    ap.add_argument("--image-size", type=int, default=112)
    return ap.parse_args(argv)


def _load_variables(path, image_size):
    import jax

    from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables

    model = R2Plus1DMotionSegNet()
    if path is None:
        return init_variables(jax.random.PRNGKey(7), model,
                              (1, 3, 32, image_size, image_size))
    from echoflow.train.checkpoint import load_model_variables

    return load_model_variables(path)


def _load_study_video(args):
    """Returns (video (3,L,H,W) float[0,1], masks|None, ed_index, es_index,
    ed_label|None, es_label|None)."""
    from echoflow.ops.normalize import zeroone_normalizer

    if args.video is not None:
        from motion_segment import read_video_rgb

        frames = read_video_rgb(args.video)  # (L, H, W, 3) uint8 RGB
        video = zeroone_normalizer(
            frames.transpose(3, 0, 1, 2).astype(np.float32))
        # No clinical labels for an arbitrary AVI: study the first third /
        # two-thirds points as nominal ED/ES anchors.
        length = video.shape[1]
        return video, None, length // 3, 2 * length // 3, None, None

    from echoflow.data.synthetic import make_beating_video

    beat = make_beating_video(num_frames=args.frames, period=38.0,
                              height=args.image_size, width=args.image_size,
                              seed=args.seed)
    ed = int(beat.ed_frames[0])
    es = int(beat.es_frames[beat.es_frames > ed][0])
    video = zeroone_normalizer(beat.video)
    return video, beat.masks, ed, es, beat.masks[ed], beat.masks[es]


def _curve(labels: np.ndarray) -> list:
    return np.sum(labels, axis=(-2, -1)).astype(float).tolist()


def study_consecutive(video, masks, ed, es, ed_label, es_label, fwd, segmenter):
    from echoflow.infer.ef import (
        compute_ef_using_putative_clips,
        ef_from_traces,
        start_points_of_ed_to_es_clips,
    )
    from echoflow.metrics.dice import lv_dice

    length = video.shape[1]
    out = {"study": "consecutive", "length": length,
           "ed_index": ed, "es_index": es}

    # 1. Every ED->ES covering clip, one batched forward (cells 7-14).
    starts = start_points_of_ed_to_es_clips(ed, es, length)
    labels, _, _ = fwd.segment_start_points(video, starts)
    out["start_points"] = starts.tolist()
    out["per_start_lv_curves"] = {int(s): _curve(labels[i])
                                  for i, s in enumerate(starts)}

    # 2. Consecutive-clip full-video segmentation (cells 16-24): the
    # engine's single-graph path (softmax-space tail/re-interp, the same
    # semantics the EF benchmark uses).
    seg = segmenter.segment_video(video, num_clips=1)
    out["full_video_lv_curve"] = _curve(seg)

    # 3. ED/ES dice + per-beat EF vs trace EF (cells 25-33).
    if ed_label is not None:
        out["ed_lv_dice"] = lv_dice(seg[ed], ed_label)
        out["es_lv_dice"] = lv_dice(seg[es], es_label)
    efs, pairs = compute_ef_using_putative_clips(seg, return_edes=True)
    out["ed_es_pairs"] = [list(map(int, p)) for p in pairs]
    out["per_beat_efs"] = efs
    out["mean_derived_ef"] = float(np.mean(efs)) if efs else None
    if ed_label is not None:
        out["trace_ef"] = ef_from_traces(ed_label, es_label)
    return out


def study_ed_es_only(video, masks, ed, es, ed_label, es_label, fwd, segmenter):
    from echoflow.infer.ef import (
        start_points_covering_frame,
        start_points_of_ed_to_es_clips,
    )
    from echoflow.metrics.dice import lv_dice
    from echoflow.metrics.simpson import simpson_monoplane_volume

    length = video.shape[1]
    out = {"study": "ed_es_only", "length": length,
           "ed_index": ed, "es_index": es}

    # 1. Clip clouds around ED alone and ES alone (cells 7-21).
    for name, mid in (("ed", ed), ("es", es)):
        starts = start_points_covering_frame(mid, length)
        if len(starts) == 0:
            out[f"{name}_clip_curves"] = {}
            continue
        labels, _, _ = fwd.segment_start_points(video, starts)
        out[f"{name}_clip_curves"] = {int(s): _curve(labels[i])
                                      for i, s in enumerate(starts)}

    # 2. The ED->ES cloud (cells 23-31).
    starts = start_points_of_ed_to_es_clips(ed, es, length)
    labels, _, _ = fwd.segment_start_points(video, starts)
    out["ed_to_es_curves"] = {int(s): _curve(labels[i])
                              for i, s in enumerate(starts)}

    # 3. Full-video segmentation + per-frame Simpson volume (cell 47).
    seg = segmenter.segment_video(video, num_clips=1)
    out["full_video_lv_curve"] = _curve(seg)
    out["simpson_volume_curve"] = [
        simpson_monoplane_volume((seg[t] == 1).astype(int)) for t in range(length)]

    # 4. Shift-augmentation prototype (cells 61-70): segment 5 shifted
    # copies independently; per-shift curves + per-shift ED/ES dice. The
    # production engine fuses exactly these raters on device.
    shifts = {}
    for i in range(5):
        seg_i = segmenter.segment_video(video[:, i:], num_clips=1)
        entry = {"lv_curve": _curve(seg_i)}
        if ed_label is not None and ed - i >= 0:
            entry["ed_lv_dice"] = lv_dice(seg_i[ed - i], ed_label)
        if es_label is not None and es - i >= 0:
            entry["es_lv_dice"] = lv_dice(seg_i[es - i], es_label)
        shifts[i] = entry
    out["shift_prototype"] = shifts
    return out


def _write_plots(out, outdir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def cloud(curves_by_start, title, path):
        fig, ax = plt.subplots(1, figsize=(9, 6))
        for s, curve in curves_by_start.items():
            s = int(s)
            ax.plot(np.arange(s + 1, s + len(curve)), curve[1:], alpha=0.4)
            ax.scatter([s], [curve[0]], alpha=0.6, s=80, marker="*")
        ax.set_title(title)
        ax.set_xlabel("nth Frame")
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)

    def full_curve(curve, name):
        fig, ax = plt.subplots(1, figsize=(12, 5))
        ax.scatter(np.arange(len(curve)), curve, alpha=0.8)
        for i in range(0, len(curve), 32):
            ax.axvline(i, 0, 1, c="gray")
        if out.get("ed_index") is not None:
            ax.scatter([out["ed_index"]], [curve[out["ed_index"]]],
                       color="red", s=60, label="ED")
            ax.scatter([out["es_index"]], [curve[out["es_index"]]],
                       color="purple", s=60, label="ES")
            ax.legend()
        ax.set_title("Segmented LV area")
        ax.set_xlabel("nth Frame")
        fig.tight_layout()
        fig.savefig(os.path.join(outdir, name))
        plt.close(fig)

    for key in ("per_start_lv_curves", "ed_clip_curves", "es_clip_curves",
                "ed_to_es_curves"):
        if out.get(key):
            cloud(out[key], f"LV area per clip start ({key})",
                  os.path.join(outdir, f"{key}.png"))
    if out.get("full_video_lv_curve"):
        full_curve(out["full_video_lv_curve"], "full_video_lv_curve.png")


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    from echoflow.infer.clips import ClipForward
    from echoflow.infer.pipeline import VideoSegmenter

    variables = _load_variables(args.checkpoint, args.image_size)
    video, masks, ed, es, ed_label, es_label = _load_study_video(args)
    fwd = ClipForward(dict(variables))
    # Accuracy study: pin the fp32 parity policy so recorded Dice/EF
    # figures are policy-independent (the engine default is "auto").
    segmenter = VideoSegmenter(dict(variables), dtype=jnp.float32)

    run = study_consecutive if args.study == "consecutive" else study_ed_es_only
    out = run(video, masks, ed, es, ed_label, es_label, fwd, segmenter)

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, f"clip_study_{args.study}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        if args.plots:
            _write_plots(out, args.out)
    summary = {k: v for k, v in out.items()
               if not isinstance(v, (list, dict)) or k == "per_beat_efs"}
    print(json.dumps(summary))
    return out


if __name__ == "__main__":
    main()
