"""Scaled synthetic end-to-end parity cohort: N mixed-length videos x ALL
FOUR fusion methods through the production engine (round-4 verdict item 8).

Extends `synthetic_fusion_results.json` (n=96, fixed 160 frames, SIMPLE
only) along both axes the reference's fusion notebook actually exercises
(`label_fusion_compute_EF_and_dice_on_echonet_interpolate_on_softmax.ipynb`):

  * n >= 256 videos with MIXED lengths (the real EchoNet test split is
    ragged: 112-1002 frames; the cohort cycles six length classes spanning
    the engine's bucket/t_pad variants) and EF spread wide enough for the
    Pearson-r evidence to be meaningful;
  * every fusion method the engine ships — majority, SIMPLE, STAPLE-EM,
    softmax-mean (`fuse_utils.py:84-98` hands the live-rater list to the
    named fuser; the softmax path is the notebook's interpolate-on-softmax
    prob averaging);
  * an engine-vs-LITERAL-reference tie measurement: on a subsample, the
    reference algorithm is run literally (Python loops over shifts/clips,
    batch-1 forwards, softmax-space re-interp, per-frame fusion of the
    variable-size live-rater list — `fuse_utils.py:36-102`) and diffed
    pixel-for-pixel against the engine under each method, tightening the
    <=0.1% argmax-tie budget with measured numbers at production scale.

Accuracy benchmark, not a throughput benchmark: fp32 parity policy, serial
EF/Dice host work. The throughput figure of record is bench.py's.

    python benchmarks/run_fusion_cohort.py --n 256 \
        --model save_models/synthetic_clasfv.pkl \
        --out benchmarks/synthetic_fusion_cohort.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Six length classes spanning the engine's compiled-shape variants
# (t_pad 128/192/256/320, n_fwd 16..48) — the same classes as
# benchmarks/mixed_length_study.json, cycled round-robin.
DEFAULT_LENGTHS = (112, 144, 176, 208, 256, 304)
METHODS = ("majority", "simple", "staple", "softmax")


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="multi-method fusion cohort")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--model", type=str, default=None)
    ap.add_argument("--fuse", type=int, default=5)
    ap.add_argument("--step", type=int, default=1)
    ap.add_argument("--methods", type=str, default=",".join(METHODS))
    ap.add_argument("--lengths", type=str,
                    default=",".join(str(x) for x in DEFAULT_LENGTHS))
    ap.add_argument("--tie-videos", type=int, default=8,
                    help="subsample size for the literal-reference diff "
                         "(0 disables)")
    ap.add_argument("--size", type=int, default=112,
                    help="frame height/width (tests shrink this)")
    ap.add_argument("--out", type=str, default=None)
    return ap.parse_args(argv)


def generate_cohort(n: int, lengths: tuple, size: int = 112):
    """n mixed-length beating videos. True EF = Simpson's method on the
    ground-truth ED/ES masks (the reference's clinical-trace oracle-floor
    semantics, echonet_dynamic_compute_EF_and_dice.ipynb cells 15-17).
    Videos are stored single-channel uint8 (the generator's three channels
    are identical; the engine's mono path is bit-identical to RGB)."""
    import numpy as np

    from echoflow.data.synthetic import make_beating_video
    from echoflow.infer.ef import ef_from_traces

    cohort = []
    for i in range(n):
        length = lengths[i % len(lengths)]
        period = 31 + (i % 6) * 3
        # Spread contraction strength so true EF spans a wide range —
        # Pearson r over a single EF bin would be noise.
        amplitude = 3.5 + 7.5 * i / max(n - 1, 1)
        beat = make_beating_video(num_frames=length, period=period,
                                  amplitude=amplitude, seed=i,
                                  height=size, width=size)
        ed = int(beat.ed_frames[0])
        es = int(beat.es_frames[beat.es_frames > ed][0])
        cohort.append({
            "name": f"synth{i}",
            "video": beat.video[:1].astype(np.uint8),  # mono uint8
            "true_ef": float(ef_from_traces(beat.masks[ed], beat.masks[es])),
            "ed": ed, "es": es,
            "ed_mask": beat.masks[ed], "es_mask": beat.masks[es],
        })
    return cohort


def literal_per_shift_probs(video_u8, model, variables, num_clips, step,
                            _cache={}):
    """Per-shift softmax probability stacks of the literal reference
    algorithm (`fuse_utils.py:36-80`): per shifted copy, consecutive
    32-frame clips at batch 1, softmax, re-interp the tail clip in softmax
    space back to the shift's true length. Cached per (video, plan) so the
    four fusion methods AND the tie-margin analysis share one forward
    sweep. Returns a list of (2, L_k, H, W) float32 arrays."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from echoflow.infer.pipeline import divide_to_consecutive_clips
    from echoflow.ops.resize import resize_linear

    fwd_key = ("fwd", id(model))
    if fwd_key not in _cache:
        _cache[fwd_key] = jax.jit(lambda v, x: jax.nn.softmax(
            model.apply(v, x, train=False)[0], axis=1))

    video = video_u8.astype(np.float32)
    if video.shape[0] == 1:
        video = np.repeat(video, 3, axis=0)
    # Per-channel zero-one normalization, computed with the engine's exact
    # operation order (ops/normalize.zeroone_normalize: subtract min, then
    # divide by the max of the shifted values) so fp rounding matches.
    for c in range(video.shape[0]):
        video[c] -= video[c].min()
        video[c] /= video[c].max()

    key = ("probs", id(video_u8), num_clips, step)
    if key in _cache:
        return _cache[key]
    per_shift = []
    for k in range(num_clips):
        shifted = video[:, k * step:]
        clips = divide_to_consecutive_clips(shifted, interpolate_last=True)
        probs = [np.asarray(_cache[fwd_key](variables, jnp.asarray(clip[None])))[0]
                 for clip in clips]
        flat = np.concatenate(probs, axis=1)  # (2, C*32, H, W)
        lk = shifted.shape[1]
        if lk % 32 != 0:
            flat = np.asarray(resize_linear(jnp.asarray(flat), 1, lk,
                                            align_corners=False))
        per_shift.append(flat)
    _cache[key] = per_shift
    # Keep at most one video's forward sweep resident (~60 MB each).
    for old in [k2 for k2 in _cache
                if isinstance(k2, tuple) and k2[0] == "probs" and k2 != key]:
        del _cache[old]
    return per_shift


def live_raters(i: int, num_clips: int, step: int):
    """Shift indices live at frame i — the reference's collection rule
    (`fuse_utils.py:84-98`): frame i draws shift k's frame i-k*step for
    k < min(i, num_clips); frame 0 is shift 0 alone."""
    if i == 0:
        return [0]
    out = []
    for k in range(min(i, num_clips)):
        if i - k * step < 0:
            break
        out.append(k)
    return out


def literal_reference_masks(video_u8, model, variables, num_clips, step,
                            method, _cache={}):
    """The reference algorithm, literally (`fuse_utils.py:36-102`): the
    per-shift probability stacks above, then per frame the live-rater list
    fused with the named algorithm, copying a single live rater through
    unfused (`fuse_utils.py:92-93`). Label methods fuse argmax masks;
    "softmax" averages the live raters' probabilities first (the
    interpolate-on-softmax notebook's rule)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from echoflow.ops.fusion import simple_fuse, staple_fuse

    if "simple" not in _cache:
        _cache["simple"] = jax.jit(simple_fuse)
        _cache["staple"] = jax.jit(staple_fuse)

    length = video_u8.shape[1]
    per_shift = literal_per_shift_probs(video_u8, model, variables,
                                        num_clips, step)

    fused = [np.argmax(per_shift[0][:, 0], axis=0).astype(np.uint8)]
    for i in range(1, length):
        cand = [per_shift[k][:, i - k * step]
                for k in live_raters(i, num_clips, step)]
        if method == "softmax":
            mean = np.mean(np.stack(cand), axis=0)
            fused.append(np.argmax(mean, axis=0).astype(np.uint8))
            continue
        labels = [np.argmax(c, axis=0).astype(np.uint8) for c in cand]
        if len(labels) == 1:
            fused.append(labels[0])
        elif method == "majority":
            votes = np.mean(np.stack(labels), axis=0)
            fused.append((votes > 0.5).astype(np.uint8))
        else:
            fn = _cache[method]
            fused.append(np.asarray(fn(jnp.asarray(np.stack(labels)))))
    return np.stack(fused)


def main(argv=None):
    args = parse_args(argv)

    from echoflow.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.run_ef_benchmark import ef_aggregates
    from echoflow.infer.ef import compute_ef_using_putative_clips
    from echoflow.infer.pipeline import VideoSegmenter
    from echoflow.metrics.dice import lv_dice
    from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables

    if args.model:
        from echoflow.train.checkpoint import load_model_variables

        variables = load_model_variables(args.model)
    else:
        print("WARNING: no --model given; using random weights "
              "(pipeline-mechanics cohort only)", file=sys.stderr)
        variables = init_variables(jax.random.PRNGKey(0), R2Plus1DMotionSegNet())

    model = R2Plus1DMotionSegNet()
    # Accuracy benchmark: pin the fp32 parity policy (engine default "auto").
    segmenter = VideoSegmenter(variables, dtype=jnp.float32)

    methods = [m.strip() for m in args.methods.split(",") if m.strip()]
    lengths = tuple(int(x) for x in args.lengths.split(","))

    print(f"generating {args.n} videos over lengths {lengths} ...",
          file=sys.stderr)
    tic = time.time()
    cohort = generate_cohort(args.n, lengths, size=args.size)
    gen_sec = time.time() - tic
    total_frames = sum(s["video"].shape[1] for s in cohort)

    results = {
        "config": {
            "n": args.n, "fuse": args.fuse, "step": args.step,
            "methods": methods, "lengths": list(lengths),
            "model": args.model, "dtype": "float32 (parity policy)",
            "generation_sec": round(gen_sec, 1),
            "total_frames_per_method": int(total_frames),
        },
        "methods": {},
    }

    per_video_efs = {}  # method -> {name: pred_ef} for cross-method deltas
    for method in methods:
        tic = time.time()
        pred_efs, true_efs = [], []
        ed_dices, es_dices = [], []
        skipped = 0
        efs_by_name = {}
        seg_iter = segmenter.segment_videos(
            (s["video"] for s in cohort), num_clips=args.fuse,
            step=args.step, fuse_method=method)
        for sample, seg in zip(cohort, seg_iter):
            # Fusion-notebook protocol (cell 6): Dice recorded for every
            # readable video, before the no-beats EF skip.
            ed_dices.append(lv_dice(seg[sample["ed"]], sample["ed_mask"]))
            es_dices.append(lv_dice(seg[sample["es"]], sample["es_mask"]))
            efs = compute_ef_using_putative_clips(seg)
            if not efs:
                skipped += 1
                continue
            ef = float(np.mean(efs))
            efs_by_name[sample["name"]] = ef
            pred_efs.append(ef)
            true_efs.append(sample["true_ef"])
        elapsed = time.time() - tic
        per_video_efs[method] = efs_by_name
        results["methods"][method] = {
            "ef": ef_aggregates(np.asarray(pred_efs), np.asarray(true_efs)),
            "skipped_no_beats": skipped,
            "ed_lv_dice": {"mean": float(np.mean(ed_dices)),
                           "std": float(np.std(ed_dices)),
                           "median": float(np.median(ed_dices))},
            "es_lv_dice": {"mean": float(np.mean(es_dices)),
                           "std": float(np.std(es_dices)),
                           "median": float(np.median(es_dices))},
            "wall_clock_sec": round(elapsed, 1),
            "frames_per_sec": round(total_frames / elapsed, 1),
        }
        ef_agg = results["methods"][method]["ef"]
        if ef_agg.get("n"):
            r = ef_agg.get("pearson_r")
            print(f"{method}: EF MAE {ef_agg['mae']:.4f}, "
                  f"r {r if r is None else round(r, 4)}, {elapsed:.0f}s",
                  file=sys.stderr)
        else:
            print(f"{method}: no EF-scorable videos, {elapsed:.0f}s",
                  file=sys.stderr)

    # Cross-method EF spread: how much the fusion-algorithm choice moves the
    # final clinical number on identical segment stacks (notebook cells
    # 13-18 compare exactly this).
    common = set.intersection(*(set(v) for v in per_video_efs.values())) \
        if per_video_efs else set()
    if len(per_video_efs) > 1 and common:
        stack = np.asarray([[per_video_efs[m][n] for n in sorted(common)]
                            for m in methods])
        results["cross_method_ef_spread"] = {
            "n_common": len(common),
            "mean_abs_pairwise_delta": float(np.mean([
                np.mean(np.abs(stack[a] - stack[b]))
                for a in range(len(methods)) for b in range(a + 1, len(methods))])),
            "max_abs_delta_any_video": float(
                np.max(stack.max(axis=0) - stack.min(axis=0))),
        }

    # ---- literal-reference tie measurement (engine vs fuse_utils.py loop)
    #
    # The engine's fused graph and the literal batch-1 loop compute the same
    # probabilities up to fp reduction order (batched convs vs batch-1,
    # TPU's reduced-precision matmuls), so pixels whose decision sits within
    # fp noise of 0.5 can argmax either way. The tie claim is therefore made
    # precise in two parts: (a) the raw divergence fraction, and (b) EVERY
    # divergent pixel must be a near-tie — its decision margin (per-rater
    # |p_fg - 0.5| for label fusers, fused-mean margin for softmax, from the
    # literal path's own probabilities) below `margin_eps`. A divergent
    # pixel with a LARGE margin would be a real algorithmic difference;
    # `non_tie_divergence_fraction` counts exactly those, budget 1e-4.
    if args.tie_videos > 0:
        margin_eps = 0.05
        tie = {"n_videos": 0, "num_clips": args.fuse, "step": args.step,
               "margin_eps": margin_eps, "non_tie_budget": 1e-4,
               "per_method": {}}
        # Shortest lengths first: the literal path is batch-1 forwards.
        subsample = sorted(cohort, key=lambda s: s["video"].shape[1])
        subsample = subsample[:args.tie_videos]
        tie["n_videos"] = len(subsample)
        mismatch = {m: [] for m in methods}
        non_tie = {m: [] for m in methods}
        for sample in subsample:
            engine_masks = {
                m: segmenter.segment_video(sample["video"], num_clips=args.fuse,
                                           step=args.step, fuse_method=m)
                for m in methods}
            per_shift = literal_per_shift_probs(
                sample["video"], model, variables, args.fuse, args.step)
            length = sample["video"].shape[1]
            # Decision-margin maps from the literal path's probabilities.
            lab_margin = np.empty((length, *per_shift[0].shape[2:]), np.float32)
            sm_margin = np.empty_like(lab_margin)
            for i in range(length):
                live = live_raters(i, args.fuse, args.step)
                fg = np.stack([per_shift[k][1, i - k * args.step] for k in live])
                # Label fusers diverge when ANY contributing rater's argmax
                # flips; softmax diverges when the fused mean flips.
                lab_margin[i] = np.abs(fg - 0.5).min(axis=0)
                sm_margin[i] = np.abs(fg.mean(axis=0) - 0.5)
            for m in methods:
                want = literal_reference_masks(
                    sample["video"], model, variables, args.fuse, args.step, m)
                diff = engine_masks[m] != want
                mismatch[m].append(float(diff.mean()))
                margin = sm_margin if m == "softmax" else lab_margin
                non_tie[m].append(float((diff & (margin > margin_eps)).mean()))
        for m in methods:
            tie["per_method"][m] = {
                "max_mismatch_fraction": max(mismatch[m]),
                "mean_mismatch_fraction": float(np.mean(mismatch[m])),
                "non_tie_divergence_fraction": max(non_tie[m]),
            }
            print(f"tie {m}: max mismatch {max(mismatch[m]):.2e}, "
                  f"non-tie {max(non_tie[m]):.2e}", file=sys.stderr)
        results["tie_check"] = tie

    print(json.dumps(results, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
