"""CLAS-FV joint training driver.

The real-entry-point equivalent of the reference's training notebook
(`echonet_dynamic_R2plus1D_CLAS_FV_train_test.ipynb`): EchoNet-Dynamic
random ED..ES 32-frame windows, Adam lr 1e-4 with the manual drop to 1e-5
at epoch 3, batch 4, 10 epochs, best-validation checkpoint. Runs on the
pinned reference folds when given `--folds /root/reference/fold_indexes`,
or on synthetic fixtures (`--synthetic`) when the gated dataset is absent.

    python train_clasfv.py --data /path/to/EchoNet-Dynamic \
        [--folds fold_indexes_dir] [--epochs 10] [--batch-size 4] \
        [--out save_models/clasfv.pkl]
    python train_clasfv.py --synthetic --steps 50   # smoke-scale run
"""

from __future__ import annotations

import argparse
import time


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="Train CLAS-FV on EchoNet-Dynamic")
    ap.add_argument("--data", type=str, default=None, help="EchoNet-Dynamic root")
    ap.add_argument("--folds", type=str, default=None,
                    help="dir with stanford_{train,valid}_sampled_indices pickles")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on synthetic beating-heart fixtures")
    ap.add_argument("--recipe", choices=["clasfv", "ed_es_only"],
                    default="clasfv",
                    help="clasfv: joint ED..ES-window recipe (main notebook); "
                         "ed_es_only: two clips per sample, one covering ED "
                         "and one ES, single-label warp loss (the "
                         "ed_or_es_only notebook; its defaults there were "
                         "batch 2, 8 epochs, 3500-video subsample/epoch)")
    ap.add_argument("--epoch-subsample", type=int, default=None,
                    help="randomly subsample this many videos per epoch "
                         "(the ed_es_only notebook uses 3500)")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--steps", type=int, default=None,
                    help="cap steps per epoch (smoke runs)")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-drop-epoch", type=int, default=3)
    ap.add_argument("--lr-after-drop", type=float, default=1e-5)
    ap.add_argument("--clip-length", type=int, default=32)
    ap.add_argument("--compute-dtype", choices=["fp32", "bf16"], default="fp32",
                    help="model compute dtype (params/optimizer stay fp32). "
                         "fp32 is the reference-parity default; bf16 is a "
                         "measured -12%% step-time opt-in that changes the "
                         "optimization trajectory (see train/loop.py)")
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--out", type=str, default="save_models/clasfv_checkpoint.pkl")
    ap.add_argument("--init-from", type=str, default=None,
                    help="stock torchvision r2plus1d_18 Kinetics-400 .pth: "
                         "initialize the backbone (stem/layer1-4/fc) from "
                         "it, heads stay fresh — the reference recipe "
                         "(R2plus1D_18_MotionNet.py:13 pretrained=True)")
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint to resume from (restores params/opt/"
                         "step/RNG and the epoch counter)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cache-samples", type=int, default=0,
                    help="synthetic mode: pre-generate this many samples "
                         "once and draw batches from the pool")
    return ap.parse_args(argv)


_SAMPLE_CACHE = {}


def should_save_best(val: float, best_val: float) -> bool:
    """Best-val checkpoint rule: only a finite validation loss strictly
    better than the best so far wins; NaN/inf never overwrite the best."""
    import numpy as np

    return bool(np.isfinite(val)) and val < best_val


def synthetic_batches(batch_size, clip_length, image_size, steps, seed,
                      cache_samples: int = 0, pool_seed_base: int = 0):
    """Synthetic training batches (see echoflow.data.synthetic). With
    cache_samples > 0 a fixed pool is generated once and batches draw from
    it — keeps the single host core from bottlenecking the train step.
    `pool_seed_base` separates sample populations: validation uses a
    disjoint seed range so it is a held-out set, not the training pool."""
    import numpy as np

    from echoflow.data.synthetic import make_training_sample

    def collate(samples):
        return {
            "video": np.stack([s["video"] for s in samples]).astype(np.float32),
            "ed_label": np.stack([s["ed_label"] for s in samples]).astype(np.int32),
            "es_label": np.stack([s["es_label"] for s in samples]).astype(np.int32),
            "ed_idx": np.asarray([s["ed_idx"] for s in samples], np.int32),
            "es_idx": np.asarray([s["es_idx"] for s in samples], np.int32),
        }

    if cache_samples:
        key = (clip_length, image_size, cache_samples, pool_seed_base)
        if key not in _SAMPLE_CACHE:
            _SAMPLE_CACHE[key] = [
                make_training_sample(clip_length, image_size, image_size,
                                     seed=pool_seed_base + i)
                for i in range(cache_samples)
            ]
        pool = _SAMPLE_CACHE[key]
        rng = np.random.RandomState(seed)
        for _ in range(steps):
            idx = rng.choice(len(pool), batch_size, replace=False)
            yield collate([pool[i] for i in idx])
        return

    for step in range(steps):
        yield collate([
            make_training_sample(clip_length, image_size, image_size,
                                 seed=pool_seed_base + seed + step * batch_size + i)
            for i in range(batch_size)
        ])


def synthetic_ed_es_batches(batch_size, clip_length, image_size, steps, seed,
                            pool_seed_base: int = 0):
    """Synthetic batches for the ed-or-es-only recipe."""
    import numpy as np

    from echoflow.data.synthetic import make_ed_es_only_sample

    for step in range(steps):
        samples = [
            make_ed_es_only_sample(clip_length, image_size, image_size,
                                   seed=pool_seed_base + seed + step * batch_size + i)
            for i in range(batch_size)
        ]
        yield {
            "ed_video": np.stack([s["ed_video"] for s in samples]).astype(np.float32),
            "es_video": np.stack([s["es_video"] for s in samples]).astype(np.float32),
            "ed_label": np.stack([s["ed_label"] for s in samples]).astype(np.int32),
            "es_label": np.stack([s["es_label"] for s in samples]).astype(np.int32),
            "ed_idx": np.asarray([s["ed_idx"] for s in samples], np.int32),
            "es_idx": np.asarray([s["es_idx"] for s in samples], np.int32),
        }


def echonet_ed_es_batches(dataset, batch_size, steps=None):
    """Batches from EchoNetEDESOnlyDataset (two clips per sample)."""
    import numpy as np

    buf = []
    count = 0
    for i in range(len(dataset)):
        try:
            d = dataset[i]
        except Exception as exc:
            print(f"skipping sample {i}: {exc}")
            continue
        buf.append(d)
        if len(buf) == batch_size:
            yield {
                "ed_video": np.stack([b["ed_video_clip"] for b in buf]).astype(np.float32),
                "es_video": np.stack([b["es_video_clip"] for b in buf]).astype(np.float32),
                "ed_label": np.stack([b["ed_label"] for b in buf]).astype(np.int32),
                "es_label": np.stack([b["es_label"] for b in buf]).astype(np.int32),
                "ed_idx": np.asarray([b["ed_clip_index"] for b in buf], np.int32),
                "es_idx": np.asarray([b["es_clip_index"] for b in buf], np.int32),
            }
            buf = []
            count += 1
            if steps is not None and count >= steps:
                return


def echonet_batches(dataset, batch_size, steps=None):
    """Batches from EchoNetDynamicDataset, skipping unusable samples the way
    the reference's loader does (ad-hoc guards, SURVEY.md §5)."""
    import numpy as np

    buf = []
    count = 0
    for i in range(len(dataset)):
        try:
            video, (filename, ef, es_ci, ed_ci, *_rest, es_lab, ed_lab) = dataset[i]
        except Exception as exc:  # unreadable video / bad ED-ES, as reference
            print(f"skipping sample {i}: {exc}")
            continue
        buf.append((video, ed_lab, es_lab, ed_ci, es_ci))
        if len(buf) == batch_size:
            yield {
                "video": np.stack([b[0] for b in buf]).astype(np.float32),
                "ed_label": np.stack([b[1] for b in buf]).astype(np.int32),
                "es_label": np.stack([b[2] for b in buf]).astype(np.int32),
                "ed_idx": np.asarray([b[3] for b in buf], np.int32),
                "es_idx": np.asarray([b[4] for b in buf], np.int32),
            }
            buf = []
            count += 1
            if steps is not None and count >= steps:
                return


def main(argv=None):
    args = parse_args(argv)

    from echoflow.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from echoflow.parallel.mesh import data_mesh
    from echoflow.train.checkpoint import save_checkpoint
    from echoflow.train.loop import (
        TrainConfig, create_train_state, fit_on_mesh,
        make_ed_es_only_eval_step, make_ed_es_only_train_step, make_eval_step)

    if not args.synthetic and args.data is None:
        raise SystemExit("pass --data <EchoNet root> or --synthetic")

    steps_per_epoch = args.steps or (7332 // args.batch_size)
    cfg = TrainConfig(
        lr=args.lr,
        lr_drop_step=args.lr_drop_epoch * steps_per_epoch,
        lr_after_drop=args.lr_after_drop,
        clip_length=args.clip_length,
        image_size=(args.image_size, args.image_size),
        batch_size=args.batch_size,
        compute_dtype={"fp32": jnp.float32, "bf16": jnp.bfloat16}[args.compute_dtype],
    )
    model, state, tx = create_train_state(jax.random.PRNGKey(args.seed), cfg)
    start_epoch = 0
    if args.init_from:
        if args.resume:
            raise SystemExit("--init-from and --resume are mutually "
                             "exclusive (resume already carries weights)")
        from echoflow.models.convert import load_kinetics_backbone

        variables = load_kinetics_backbone(
            args.init_from,
            {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        print(f"initialized backbone from Kinetics checkpoint {args.init_from}")
    if args.resume:
        from echoflow.train.checkpoint import restore_train_state

        state, extra = restore_train_state(args.resume)
        start_epoch = int(extra.get("epoch", -1)) + 1
        # Restore the best-val watermark too — otherwise the first finite
        # post-resume validation would clobber a strictly better best
        # checkpoint at --out.
        resumed_best_val = float(extra.get("val_loss", float("inf")))
        print(f"resumed from {args.resume} at step {int(state.step)}, "
              f"starting epoch {start_epoch}")
    mesh = data_mesh()
    ed_es_only = args.recipe == "ed_es_only"
    eval_step = jax.jit((make_ed_es_only_eval_step if ed_es_only
                         else make_eval_step)(model))
    step_factory = make_ed_es_only_train_step if ed_es_only else None

    def epoch_batches(epoch, split):
        if args.synthetic:
            n = args.steps or 20
            # Validation draws from a disjoint seed range (held-out
            # population) — train and val must not share samples.
            val = split != "train"
            if ed_es_only:
                return synthetic_ed_es_batches(
                    args.batch_size, args.clip_length, args.image_size,
                    max(2, n // 8) if val else n,
                    seed=args.seed + epoch * 100_000 + (7_777 if val else 0),
                    pool_seed_base=50_000_000 if val else 0)
            return synthetic_batches(args.batch_size, args.clip_length,
                                     args.image_size,
                                     max(2, n // 8) if val else n,
                                     seed=args.seed + epoch * 100_000
                                          + (7_777 if val else 0),
                                     cache_samples=(max(8, args.cache_samples // 8)
                                                    if val else args.cache_samples)
                                                   if args.cache_samples else 0,
                                     pool_seed_base=50_000_000 if val else 0)
        from echoflow.data.echonet import (
            EchoNetDynamicDataset, EchoNetEDESOnlyDataset, load_fold_indices)

        subset = None
        if args.folds:
            import os

            name = ("stanford_train_sampled_indices" if split == "train"
                    else "stanford_valid_sampled_indices")
            subset = load_fold_indices(os.path.join(args.folds, name))
        if split == "train" and args.epoch_subsample:
            # The ed_or_es_only notebook re-subsamples 3500 videos per
            # epoch (cell 8) from the fold with a fresh RNG each epoch.
            rng = np.random.RandomState(args.seed + epoch)
            pool = subset if subset is not None else None
            if pool is None:
                # A bare index gives the split size with zero video decodes
                # (a throwaway dataset would run get_mean_and_std over
                # dozens of videos every epoch).
                from echoflow.data.echonet import EchoNetIndex

                pool = list(range(len(EchoNetIndex(args.data).split(split))))
            k = min(args.epoch_subsample, len(pool))
            subset = [pool[j] for j in rng.choice(len(pool), k, replace=False)]
        cls = EchoNetEDESOnlyDataset if ed_es_only else EchoNetDynamicDataset
        ds = cls(args.data, split=split, clip_length=args.clip_length,
                 subset_indices=subset, seed=args.seed + epoch)
        batcher = echonet_ed_es_batches if ed_es_only else echonet_batches
        return batcher(ds, args.batch_size, args.steps)

    best_val = resumed_best_val if args.resume else float("inf")
    for epoch in range(start_epoch, args.epochs):
        tic = time.time()
        state, history = fit_on_mesh(
            mesh, model, state, tx, epoch_batches(epoch, "train"),
            log_every=args.log_every, step_factory=step_factory,
            donate=True)  # hot path: only the returned state is used
        # Validation pass.
        val_losses, ed_d, es_d = [], [], []
        for batch in epoch_batches(epoch, "val"):
            m = eval_step(state, jax.tree.map(jax.numpy.asarray, batch))
            val_losses.append(float(m["loss"]))
            ed_d.append(float(m["ed_dice"]))
            es_d.append(float(m["es_dice"]))
        val = float(np.mean(val_losses)) if val_losses else float("nan")
        print(f"epoch {epoch}: val loss {val:.4f} "
              f"ED dice {np.mean(ed_d or [0]):.3f} ES dice {np.mean(es_d or [0]):.3f} "
              f"({time.time() - tic:.0f}s)")
        # Best-val semantics: a NaN validation must never overwrite the best
        # checkpoint (it is a diverged run, not a better one).
        if should_save_best(val, best_val):
            best_val = val
            save_checkpoint(args.out, state,
                            extra={"epoch": epoch, "val_loss": val,
                                   "seed": args.seed})
            print(f"saved checkpoint -> {args.out}")
        # Always persist the latest state separately: with an empty or
        # permanently-NaN validation stream the best checkpoint never
        # fires, and a finished run must not lose its weights.
        save_checkpoint(args.out + ".last", state,
                        extra={"epoch": epoch, "val_loss": val,
                               "seed": args.seed})
    return state


if __name__ == "__main__":
    main()
