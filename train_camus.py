"""CAMUS-style 4-class segmentation training driver (legacy harness).

Exercises the CAMUS-era surface end-to-end: dict-pipeline transforms
(rotation about the apex, intensity windowing, noise), the generic
run_training/run_validation loops with gradient accumulation, per-name Dice
validation (incl. the LVepi union), and optionally the ACNN shape-prior
regularizer. The reference repo ships this harness without the CAMUS
network itself (SURVEY.md §1 L2 lists only the R(2+1)D model), so a compact
encoder-decoder segmentation net is provided; CAMUS data is access-gated,
so `--synthetic` generates 4-class (BG/LV/Myo/LA) phantoms.

    python train_camus.py --synthetic --epochs 3
    python train_camus.py --data /path/CAMUS --epochs 30 --acnn
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="CAMUS 4-class segmentation training")
    ap.add_argument("--data", type=str, default=None, help="CAMUS root (patientNNNN dirs)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--samples", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--effective-batchsize", type=int, default=4,
                    help="gradient-accumulation factor (reference CAMUS config: 16)")
    ap.add_argument("--lr", type=float, default=2e-3)   # CAMUS_CONFIG default
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--acnn", action="store_true", help="add the AE shape prior")
    ap.add_argument("--seed", type=int, default=0)
    return ap.parse_args(argv)


def make_camus_phantom(h, w, rng):
    """4-class phantom: LV cavity (1) inside a myocardial ring (2), atrium
    (3) below, speckle background."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = h * 0.42 + rng.randn() * 2, w * 0.5 + rng.randn() * 2
    r = h * rng.uniform(0.16, 0.22)
    lv = ((yy - cy) / (1.5 * r)) ** 2 + ((xx - cx) / r) ** 2 <= 1.0
    epi = ((yy - cy) / (1.5 * r + 4)) ** 2 + ((xx - cx) / (r + 4)) ** 2 <= 1.0
    la = (((yy - (cy + 1.9 * r)) / (0.7 * r)) ** 2 + ((xx - cx) / (0.8 * r)) ** 2) <= 1.0
    label = np.zeros((h, w), np.int32)
    label[epi] = 2
    label[lv] = 1
    label[la & (label == 0)] = 3
    img = 0.25 + 0.12 * (label == 2) + 0.02 * (label == 1) + 0.08 * (label == 3)
    img = img + 0.04 * rng.randn(h, w)
    return {"images": img.astype(np.float32)[None], "labels": label}


def build_model(num_classes=4):
    import flax.linen as nn
    import jax.numpy as jnp

    class SegNet(nn.Module):
        @nn.compact
        def __call__(self, x):  # (N, 1, H, W) -> (N, C, H, W) logits
            h = jnp.transpose(x, (0, 2, 3, 1))
            e1 = nn.relu(nn.Conv(16, (3, 3))(h))
            e2 = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2))(e1))
            e3 = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2))(e2))
            d2 = nn.relu(nn.ConvTranspose(32, (3, 3), strides=(2, 2))(e3))
            d1 = nn.relu(nn.ConvTranspose(16, (3, 3), strides=(2, 2))(
                jnp.concatenate([d2, e2], -1)))
            out = nn.Conv(num_classes, (1, 1))(jnp.concatenate([d1, e1], -1))
            return jnp.transpose(out, (0, 3, 1, 2))

    return SegNet()


def main(argv=None):
    args = parse_args(argv)

    from echoflow.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from echoflow.data.transforms import RotateImagesAndLabels, WindowImagesAndLabels
    from echoflow.train.generic import (
        ShapeAutoencoder, TransformDataset, batch_iterator, run_training,
        run_training_acnn, run_validation)

    rng = np.random.RandomState(args.seed)
    hw = args.image_size

    if args.synthetic or not args.data:
        records = [make_camus_phantom(hw, hw, rng) for _ in range(args.samples)]
    else:
        from echoflow.data.transforms import load_camus_sequence, make_camus_echo_dataset
        from echoflow.utils.echo_io import readTransformResizeImage

        dataset = make_camus_echo_dataset(args.data)
        records = []
        for patient, views in dataset.items():
            for view, files in views.items():
                img = readTransformResizeImage(files["ED"], (hw, hw))
                lab = readTransformResizeImage(files["ED_gt"], (hw, hw), outtype=np.int64)
                records.append({"images": img.astype(np.float32),
                                "labels": lab[0].astype(np.int32)})

    aug = [WindowImagesAndLabels((0.7, 1.0), rng=rng),
           RotateImagesAndLabels(scale=8.0, rng=rng)]
    ds = TransformDataset(records, augment_transforms=aug)

    model = build_model()
    params = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, 1, hw, hw)))
    apply_fn = lambda p, x: model.apply(p, x)

    ae = ae_vars = None
    if args.acnn:
        ae = ShapeAutoencoder(num_classes=4, latent_dim=32, hidden=8)
        ae_vars = ae.init(jax.random.PRNGKey(args.seed + 1),
                          jnp.zeros((1, 4, hw, hw)))

    opt_state = None
    import optax

    optimizer = optax.MultiSteps(optax.adamw(args.lr, weight_decay=1e-5),
                                 every_k_schedule=args.effective_batchsize)
    for epoch in range(args.epochs):
        it = batch_iterator(ds, args.batch_size, rng=np.random.RandomState(epoch))
        if args.acnn:
            params, opt_state, avg, example = run_training_acnn(
                apply_fn, params, ae, ae_vars, it,
                effective_batchsize=args.effective_batchsize,
                learning_rate=args.lr, keys=("images", "labels"))
        else:
            params, opt_state, avg, example = run_training(
                apply_fn, params, it, effective_batchsize=args.effective_batchsize,
                optimizer=optimizer, opt_state=opt_state, keys=("images", "labels"))
        print(f"epoch {epoch}: train loss {avg:.4f}")

    avg, example, dices = run_validation(
        apply_fn, params, batch_iterator(ds, args.batch_size, shuffle=False),
        keys=("images", "labels"), do_dice=True)
    summary = {k: round(float(np.mean(v)), 3) for k, v in dices.items()}
    print(f"validation loss {avg:.4f} dice-by-name {summary}")
    return params, summary


if __name__ == "__main__":
    main()
