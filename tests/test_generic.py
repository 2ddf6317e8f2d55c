"""Generic legacy harness tests: batching, dice loss, training loop with
gradient accumulation, ACNN shape prior, viz helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echoflow.infer.ef import ef_from_traces, get_all_possible_start_points
from echoflow.train.generic import (
    BetterLoss,
    OneHotBatch,
    ShapeAutoencoder,
    TransformDataset,
    acnn_loss,
    batch_iterator,
    collate_dicts,
    foreground_dice_loss,
    run_training,
    run_validation,
)
from echoflow.utils.visualize import (

    box_plot_outliers,
    find_outlier,
    get_class_pixels,
    label2LabColorMap,
    plotContours,
)

# Full-model CPU compiles: minutes on this 1-core host (see pytest.ini).
pytestmark = pytest.mark.slow


def _toy_records(n=8, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    recs = []
    for _ in range(n):
        cy, cx = rng.randint(5, 11, 2)
        yy, xx = np.mgrid[0:h, 0:w]
        lab = (((yy - cy) ** 2 + (xx - cx) ** 2) <= 9).astype(np.int32)
        img = (0.2 + 0.6 * lab + 0.05 * rng.randn(h, w)).astype(np.float32)
        recs.append({"inputs": img[None], "outputs": lab})
    return recs


def _linear_seg_model(num_classes=2):
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):  # (N, 1, H, W) -> (N, C, H, W)
            h = jnp.transpose(x, (0, 2, 3, 1))
            h = nn.Conv(8, (3, 3))(h)
            h = nn.relu(h)
            h = nn.Conv(num_classes, (1, 1))(h)
            return jnp.transpose(h, (0, 3, 1, 2))

    return M()


def test_dataset_and_batching():
    ds = TransformDataset(_toy_records(6),
                          augment_transforms=[lambda d: {**d, "aug": 1}])
    assert len(ds) == 6 and ds[0]["aug"] == 1
    batches = list(batch_iterator(ds, 4, rng=np.random.RandomState(0)))
    assert len(batches) == 1  # drop_last
    assert batches[0]["inputs"].shape == (4, 1, 16, 16)
    c = collate_dicts([{"a": np.ones(2)}, {"a": np.zeros(2)}])
    assert c["a"].shape == (2, 2)


def test_foreground_dice_loss_perfect():
    lab = np.zeros((2, 8, 8), np.int32)
    lab[:, 2:6, 2:6] = 1
    one_hot = np.stack([(lab == 0), (lab == 1)], 1).astype(np.float32)
    logits = jnp.asarray(20.0 * (one_hot - 0.5))
    loss = float(foreground_dice_loss(logits, jnp.asarray(one_hot)))
    np.testing.assert_allclose(loss, -1.0, atol=1e-3)  # perfect fg dice = 1


def test_run_training_learns():
    model = _linear_seg_model()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, 16, 16)))

    def apply_fn(p, x):
        return model.apply(p, x)

    ds = TransformDataset(_toy_records(8))
    losses = []
    opt_state = None
    optimizer = None
    import optax

    optimizer = optax.MultiSteps(optax.adamw(3e-3, weight_decay=1e-5),
                                 every_k_schedule=2)
    for epoch in range(6):
        params, opt_state, avg, example = run_training(
            apply_fn, params, batch_iterator(ds, 4, rng=np.random.RandomState(epoch)),
            effective_batchsize=2, optimizer=optimizer, opt_state=opt_state)
        losses.append(avg)
    assert losses[-1] < losses[0]
    avg, example = run_validation(apply_fn, params,
                                  batch_iterator(ds, 4, shuffle=False))
    assert np.isfinite(avg)


def test_acnn_loss_and_autoencoder(rng):
    ae = ShapeAutoencoder(num_classes=2, latent_dim=8, hidden=4)
    sample = jnp.zeros((1, 2, 16, 16))
    variables = ae.init(jax.random.PRNGKey(0), sample)
    recon, z = ae.apply(variables, jnp.asarray(rng.rand(2, 2, 16, 16), jnp.float32))
    assert recon.shape == (2, 2, 16, 16) and z.shape == (2, 8)

    logits = jnp.asarray(rng.randn(2, 2, 16, 16), jnp.float32)
    labels = jnp.asarray((rng.rand(2, 16, 16) > 0.5).astype(np.int32))
    base = acnn_loss(logits, labels, ae, variables, prior_weight=0.0, num_classes=2)
    with_prior = acnn_loss(logits, labels, ae, variables, prior_weight=1.0, num_classes=2)
    assert float(with_prior) >= float(base)


def test_start_points_and_oracle_ef():
    pts = get_all_possible_start_points(10, 25, 100, 32)
    assert pts.min() == 0 and pts.max() == 10
    assert get_all_possible_start_points(0, 50, 100, 32).size == 0
    yy, xx = np.mgrid[0:64, 0:64]
    big = (((yy - 32) / 24) ** 2 + ((xx - 32) / 14) ** 2 <= 1).astype(int)
    small = (((yy - 32) / 16) ** 2 + ((xx - 32) / 9) ** 2 <= 1).astype(int)
    ef = ef_from_traces(big, small)
    assert 40 < ef < 90


def test_viz_helpers(rng, tmp_path):
    lab = rng.randint(0, 4, (16, 16))
    rgb = label2LabColorMap(lab)
    assert rgb.shape == (16, 16, 3)
    assert get_class_pixels(lab, 1).sum() == (lab == 1).sum()
    vals = np.concatenate([np.zeros(20), [10.0]])
    assert find_outlier(vals)[-1] and not find_outlier(vals)[0]
    out = box_plot_outliers({"a": vals}, str(tmp_path / "box.png"))
    assert out["a"][-1]
    img = rng.rand(16, 16).astype(np.float32)
    mask = (rng.rand(16, 16) > 0.7).astype(np.uint8)
    canvas = plotContours(img, [mask])
    assert canvas.shape == (16, 16, 3)


def test_better_loss_matches_torch_weighted_ce():
    import torch

    rng = np.random.RandomState(0)
    logits = rng.randn(3, 4, 8, 8).astype(np.float32)
    labels = rng.randint(0, 4, (3, 8, 8))
    weight = rng.rand(4).astype(np.float32) + 0.5

    ours_plain = BetterLoss()(jnp.asarray(logits), jnp.asarray(labels))
    ours_w = BetterLoss(weight)(jnp.asarray(logits), jnp.asarray(labels))
    t_plain = torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(labels))
    t_w = torch.nn.CrossEntropyLoss(weight=torch.tensor(weight))(
        torch.tensor(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours_plain), float(t_plain), rtol=1e-5)
    np.testing.assert_allclose(float(ours_w), float(t_w), rtol=1e-5)


def test_one_hot_batch_semantics():
    labels = np.stack([np.array([[0, 1], [2, 3]]), np.array([[3, 3], [0, 1]])])
    out = OneHotBatch()(labels[:, None])  # (N, 1, h, w) form
    assert out.shape == (2, 4, 2, 2)
    assert out[0, 1, 0, 1] == 1 and out[0].sum() == 4
    np.testing.assert_array_equal(np.argmax(out, axis=1), labels)
