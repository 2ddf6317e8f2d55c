"""Generic training harness (legacy CAMUS-era surface).

JAX equivalents of reference src/utils/torch_utils.py:58-855: the
dict-pipeline dataset/batching utilities, the generic one-epoch
train/validation loops with gradient accumulation ("effective batch size"),
the foreground Dice loss, and the ACNN (anatomically-constrained network)
variants that regularize segmentation with an autoencoder shape prior
(Oktay et al.; reference run_training_ACNN, torch_utils.py:639-761).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from echoflow.metrics.camus import camus_dice_by_name, dict_extend_values
from echoflow.train.camus_losses import cross_entropy
from echoflow.utils.cleanup import cleanup_segmentation


# --------------------------------------------------------------- data plumbing

class TransformDataset:
    """List of record dicts + transform pipelines (reference
    TransformDataset, torch_utils.py:143-208): `global_transforms` run once
    at construction (loading, resize), `augment_transforms` run per access."""

    def __init__(self, records: Sequence[dict], global_transforms=(),
                 augment_transforms=()):
        self.records = []
        for rec in records:
            data = dict(rec)
            for tr in global_transforms:
                data = tr(data)
            self.records.append(data)
        self.augment_transforms = list(augment_transforms)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx):
        data = dict(self.records[idx])
        for tr in self.augment_transforms:
            data = tr(data)
        return data


def collate_dicts(items: Sequence[dict]) -> dict:
    """Stack same-keyed numpy leaves (reference torch_collate,
    torch_utils.py:215-222)."""
    out = {}
    for key in items[0]:
        vals = [np.asarray(it[key]) for it in items]
        out[key] = np.stack(vals)
    return out


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   rng: np.random.RandomState | None = None,
                   drop_last: bool = True):
    """Minimal BatchIterator (reference torch_utils.py:58-139; the original
    used a thread pool per batch — pointless on this host and replaced by
    the device-side pipelining in the modern path)."""
    rng = rng or np.random
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for start in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                       batch_size):
        idx = order[start:start + batch_size]
        if len(idx) < batch_size and drop_last:
            return
        yield collate_dicts([dataset[int(i)] for i in idx])


# -------------------------------------------------------------------- losses

class BetterLoss:
    """Weighted cross-entropy as a callable loss object (reference
    BetterLoss, torch_utils.py:230-242: a class wrapper over
    nn.CrossEntropyLoss with optional per-class weights)."""

    def __init__(self, weight=None):
        self.weight = None if weight is None else jnp.asarray(
            np.asarray(weight, np.float32))

    def __call__(self, logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        logp = jax.nn.log_softmax(logits, axis=1)
        picked = jnp.take_along_axis(
            logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
        if self.weight is None:
            return -jnp.mean(picked)
        # torch's weighted CE: sum(w_y * nll) / sum(w_y).
        w = self.weight[labels.astype(jnp.int32)]
        return -jnp.sum(w * picked) / jnp.sum(w)


class OneHotBatch:
    """Batch transform: integer labels (N, 1, H, W) or (N, H, W) ->
    one-hot (N, C, H, W) float (reference OneHotBatch,
    torch_utils.py:612-635). Faithful quirk: like the reference's
    onehot_initialization_v2, the channel count is inferred per entry as
    max(label)+1 — the stored labelCount is not consulted — so a batch
    whose entries peak at different labels fails to stack, exactly as the
    original does."""

    def __init__(self, labelCount: int = 4, outtype=np.float32):
        self.labelCount = labelCount
        self.outtype = outtype

    def _one_hot(self, a: np.ndarray) -> np.ndarray:
        ncols = int(a.max()) + 1
        out = np.zeros((ncols, a.size), dtype=self.outtype)
        out[a.ravel(), np.arange(a.size)] = 1
        return out.reshape((ncols,) + a.shape)

    def __call__(self, data) -> np.ndarray:
        return np.stack([self._one_hot(np.asarray(entry).squeeze())
                         for entry in data])


def foreground_dice_loss(logits: jnp.ndarray, one_hot: jnp.ndarray) -> jnp.ndarray:
    """Softmax Dice summed over foreground classes, negated, per batch item
    (reference DiceLoss, torch_utils.py:248-288)."""
    probs = jax.nn.softmax(logits, axis=1)
    num = jnp.sum(probs * one_hot, axis=(2, 3))
    den = jnp.sum(probs * probs, axis=(2, 3)) + jnp.sum(one_hot * one_hot, axis=(2, 3))
    dice = 2.0 * num / den
    return -jnp.sum(dice[:, 1:]) / logits.shape[0]


# ------------------------------------------------------------- generic loops

def run_training(apply_fn: Callable, params, data_iterator,
                 effective_batchsize: int = 1,
                 criterion: Callable = cross_entropy,
                 optimizer: optax.GradientTransformation | None = None,
                 opt_state=None, learning_rate: float = 1e-3,
                 weight_decay: float = 1e-5,
                 keys=("inputs", "outputs"),
                 do_dice: bool = False, do_cleaning: bool = False):
    """One epoch of generic supervised training with gradient accumulation
    (reference run_training, torch_utils.py:310-418). `apply_fn(params, x)`
    -> logits. Returns (params, opt_state, avg_loss, example, dices?)."""
    in_key, out_key = keys
    if optimizer is None:
        optimizer = optax.MultiSteps(
            optax.adamw(learning_rate, weight_decay=weight_decay),
            every_k_schedule=effective_batchsize)
    if opt_state is None:
        opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, inputs, targets):
        def loss_fn(p):
            return criterion(apply_fn(p, inputs), targets)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    running = 0.0
    count = 0
    dices = {}
    example = None
    for data in data_iterator:
        inputs = jnp.asarray(data[in_key], jnp.float32)
        targets = jnp.asarray(data[out_key])
        params, opt_state, loss = step(params, opt_state, inputs, targets)
        running += float(loss)
        count += 1
        outputs = np.asarray(apply_fn(params, inputs))
        if do_cleaning:
            pred_maps = cleanup_segmentation(np.argmax(outputs, axis=1))
        else:
            pred_maps = None
        if do_dice:
            dices = dict_extend_values(
                dices, {k: np.asarray(v) for k, v in camus_dice_by_name(
                    pred_maps if pred_maps is not None else outputs,
                    np.asarray(data[out_key])[:, None]
                    if np.asarray(data[out_key]).ndim == 3
                    else np.asarray(data[out_key])).items()})
        example = (outputs[0], np.asarray(inputs)[0], np.asarray(targets)[0])

    avg = running / max(count, 1)
    if do_dice:
        return params, opt_state, avg, example, dices
    return params, opt_state, avg, example


def run_validation(apply_fn: Callable, params, data_iterator,
                   criterion: Callable = cross_entropy,
                   keys=("inputs", "outputs"),
                   do_dice: bool = False, do_cleaning: bool = False,
                   return_all: bool = False):
    """One validation pass (reference run_validation /
    run_validation_returnAll, torch_utils.py:451-600)."""
    in_key, out_key = keys
    eval_fn = jax.jit(apply_fn)
    running = 0.0
    count = 0
    dices = {}
    all_outputs = []
    example = None
    for data in data_iterator:
        inputs = jnp.asarray(data[in_key], jnp.float32)
        targets = jnp.asarray(data[out_key])
        outputs = eval_fn(params, inputs)
        running += float(criterion(outputs, targets))
        count += 1
        out_np = np.asarray(outputs)
        if do_cleaning:
            out_np_maps = cleanup_segmentation(np.argmax(out_np, axis=1))
        else:
            out_np_maps = None
        if do_dice:
            dices = dict_extend_values(
                dices, {k: np.asarray(v) for k, v in camus_dice_by_name(
                    out_np_maps if out_np_maps is not None else out_np,
                    np.asarray(data[out_key])[:, None]
                    if np.asarray(data[out_key]).ndim == 3
                    else np.asarray(data[out_key])).items()})
        if return_all:
            all_outputs.append(out_np)
        example = (out_np[0], np.asarray(inputs)[0], np.asarray(targets)[0])

    avg = running / max(count, 1)
    result = [avg, example]
    if do_dice:
        result.append(dices)
    if return_all:
        result.append(np.concatenate(all_outputs) if all_outputs else None)
    return tuple(result)


# ----------------------------------------------------------------- ACNN prior

class ShapeAutoencoder:
    """Small convolutional autoencoder over one-hot label maps — the shape
    prior network of the ACNN loops. flax-free functional definition so it
    can be constructed in one line; use `init`/`apply`."""

    def __init__(self, num_classes: int = 4, latent_dim: int = 32,
                 hidden: int = 16):
        import flax.linen as nn

        class _AE(nn.Module):
            @nn.compact
            def __call__(self, x):  # (N, C, H, W) one-hot
                h = jnp.transpose(x, (0, 2, 3, 1))
                h = nn.relu(nn.Conv(hidden, (3, 3), strides=(2, 2))(h))
                h = nn.relu(nn.Conv(2 * hidden, (3, 3), strides=(2, 2))(h))
                h = nn.relu(nn.Conv(2 * hidden, (3, 3), strides=(2, 2))(h))
                shape = h.shape
                z = nn.Dense(latent_dim)(h.reshape(h.shape[0], -1))
                h = nn.Dense(shape[1] * shape[2] * shape[3])(z).reshape(shape)
                h = nn.relu(nn.ConvTranspose(2 * hidden, (3, 3), strides=(2, 2))(h))
                h = nn.relu(nn.ConvTranspose(hidden, (3, 3), strides=(2, 2))(h))
                h = nn.ConvTranspose(num_classes, (3, 3), strides=(2, 2))(h)
                recon = jnp.transpose(h, (0, 3, 1, 2))
                return recon, z

        self.module = _AE()

    def init(self, rng, sample):
        return self.module.init(rng, sample)

    def apply(self, variables, x):
        return self.module.apply(variables, x)

    def encode(self, variables, x):
        return self.module.apply(variables, x)[1]


def acnn_loss(seg_logits, labels, ae: ShapeAutoencoder, ae_variables,
              prior_weight: float = 1e-2, num_classes: int = 4):
    """CE + prior_weight * MSE(latent(softmax(pred)), latent(one-hot(label)))
    (reference run_training_ACNN, torch_utils.py:639-761)."""
    from echoflow.ops.normalize import one_hot_channels

    ce = cross_entropy(seg_logits, labels)
    probs = jax.nn.softmax(seg_logits, axis=1)
    one_hot = one_hot_channels(labels[:, None], num_classes)
    z_pred = ae.encode(ae_variables, probs)
    z_true = jax.lax.stop_gradient(ae.encode(ae_variables, one_hot))
    prior = jnp.mean((z_pred - z_true) ** 2)
    return ce + prior_weight * prior


def run_training_acnn(apply_fn, params, ae: ShapeAutoencoder, ae_variables,
                      data_iterator, effective_batchsize: int = 1,
                      prior_weight: float = 1e-2, learning_rate: float = 1e-3,
                      weight_decay: float = 1e-5, keys=("images", "labels")):
    """One epoch of ACNN training: the autoencoder is frozen; only the
    segmentation network updates (reference torch_utils.py:639-761)."""
    criterion = lambda logits, labels: acnn_loss(
        logits, labels, ae, ae_variables, prior_weight)
    return run_training(apply_fn, params, data_iterator, effective_batchsize,
                        criterion=criterion, learning_rate=learning_rate,
                        weight_decay=weight_decay, keys=keys)


def run_validation_acnn(apply_fn, params, ae: ShapeAutoencoder, ae_variables,
                        data_iterator, prior_weight: float = 1e-2,
                        keys=("images", "labels"), do_dice: bool = True,
                        do_cleaning: bool = False):
    """One ACNN validation pass: the generic pass with the shape-prior
    criterion, so reported loss = CE + prior exactly as training optimizes
    (reference run_validation_ACNN, torch_utils.py:765-854)."""
    criterion = lambda logits, labels: acnn_loss(
        logits, labels, ae, ae_variables, prior_weight)
    return run_validation(apply_fn, params, data_iterator,
                          criterion=criterion, keys=keys, do_dice=do_dice,
                          do_cleaning=do_cleaning)


# Reference-cased aliases (torch_utils.py names).
run_training_ACNN = run_training_acnn
run_validation_ACNN = run_validation_acnn
