"""bf16-vs-fp32 training study with END metrics (round-4 verdict item 5).

The earlier justification for the bf16 train opt-in was a first-step Adam
update cosine (0.45 vs fp32) — a direction statement, not an outcome
statement. This study settles it the right way: run the synthetic
convergence recipe (train_clasfv.py --synthetic, the same task whose fp32
run produced the bundled `save_models/synthetic_clasfv.pkl`) to completion
in BOTH dtypes from the same seed, evaluate both finals on the SAME
held-out synthetic set with the SAME fp32 eval step, and decide the
default from the end ED/ES dice gap (adoption bar: |Δdice| <= 0.001, the
BASELINE.md accuracy bar).

    python benchmarks/run_bf16_train_study.py \
        [--steps 600] [--epochs 1] [--out benchmarks/bf16_train_study.json]

Also refreshes `save_models/synthetic_clasfv.pkl` from the fp32 run when
`--save-fp32-checkpoint` is given (the tests' trained-weight fixture).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--cache-samples", type=int, default=256)
    ap.add_argument("--eval-batches", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="benchmarks/bf16_train_study.json")
    ap.add_argument("--workdir", default="/tmp/bf16_study")
    ap.add_argument("--save-fp32-checkpoint", action="store_true",
                    help="copy the fp32 run's final checkpoint to "
                         "save_models/synthetic_clasfv.pkl")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from echoflow.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import numpy as np

    import train_clasfv
    from echoflow.train.checkpoint import restore_train_state
    from echoflow.train.loop import TrainConfig, create_train_state, make_eval_step

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    # One fixed held-out eval set (disjoint seed population, same convention
    # as train_clasfv's validation split).
    eval_batches = list(train_clasfv.synthetic_batches(
        4, 32, 112, args.eval_batches, seed=args.seed + 999_999,
        pool_seed_base=90_000_000))

    # fp32 eval step for BOTH runs: params are fp32 either way, and the
    # comparison must not fold the bf16 *inference* delta into the
    # *training-trajectory* question this study answers.
    cfg32 = TrainConfig(clip_length=32, image_size=(112, 112), batch_size=4)
    model32, _, _ = create_train_state(jax.random.PRNGKey(0), cfg32,
                                       input_shape=(1, 3, 32, 112, 112))
    eval_step = jax.jit(make_eval_step(model32))

    def final_metrics(ckpt_path):
        state, _ = restore_train_state(str(ckpt_path))
        losses, ed, es = [], [], []
        for b in eval_batches:
            m = eval_step(state, jax.tree.map(jax.numpy.asarray, b))
            losses.append(float(m["loss"]))
            ed.append(float(m["ed_dice"]))
            es.append(float(m["es_dice"]))
        return {"val_loss": float(np.mean(losses)),
                "ed_dice": float(np.mean(ed)),
                "es_dice": float(np.mean(es))}

    results = {"config": {"steps": args.steps, "epochs": args.epochs,
                          "cache_samples": args.cache_samples,
                          "eval_batches": args.eval_batches,
                          "seed": args.seed,
                          "task": "train_clasfv --synthetic (the bundled "
                                  "synthetic_clasfv.pkl recipe)"}}
    for dtype in ("fp32", "bf16"):
        out = workdir / f"clasfv_{dtype}.pkl"
        timing_file = workdir / f"{dtype}_timing.json"
        # Resumable: each leg is ~20 min on-chip, so a completed leg
        # (checkpoint + timing sidecar both present) is reused rather than
        # retrained — the study survives interrupted sessions.
        if Path(str(out) + ".last").exists() and timing_file.exists():
            wall = json.loads(timing_file.read_text())["train_wall_sec"]
            print(f"{dtype}: reusing completed leg at {out}.last "
                  f"({wall:.1f}s recorded)")
        else:
            tic = time.time()
            train_clasfv.main([
                "--synthetic", "--steps", str(args.steps),
                "--epochs", str(args.epochs),
                "--cache-samples", str(args.cache_samples),
                "--compute-dtype", dtype, "--seed", str(args.seed),
                "--out", str(out), "--log-every", "100",
            ])
            wall = time.time() - tic
            timing_file.write_text(json.dumps({"train_wall_sec": wall}))
        m = final_metrics(str(out) + ".last")
        m["train_wall_sec"] = round(wall, 1)
        m["sec_per_step"] = round(wall / (args.steps * args.epochs), 3)
        results[dtype] = m
        print(f"{dtype}: {m}")

    d_ed = results["bf16"]["ed_dice"] - results["fp32"]["ed_dice"]
    d_es = results["bf16"]["es_dice"] - results["fp32"]["es_dice"]
    within = abs(d_ed) <= 1e-3 and abs(d_es) <= 1e-3
    results["delta"] = {"ed_dice": d_ed, "es_dice": d_es,
                        "speedup": round(results["fp32"]["sec_per_step"]
                                         / results["bf16"]["sec_per_step"], 3)}
    results["decision"] = (
        "bf16 end metrics within the ±0.001 dice bar of fp32"
        if within else
        "bf16 end metrics OUTSIDE the ±0.001 dice bar — fp32 stays the "
        "training default")
    Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))

    if args.save_fp32_checkpoint:
        dst = Path(__file__).resolve().parent.parent / "save_models"
        dst.mkdir(exist_ok=True)
        shutil.copy(str(workdir / "clasfv_fp32.pkl.last"),
                    dst / "synthetic_clasfv.pkl")
        print(f"saved fp32 checkpoint -> {dst / 'synthetic_clasfv.pkl'}")
    return results


if __name__ == "__main__":
    main()
