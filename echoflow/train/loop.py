"""Training / evaluation loops for CLAS-FV joint training.

Reference recipe (train notebook cells 8-10; BASELINE.md): Adam lr 1e-4,
batch 4, 10 epochs, manual LR drop to 1e-5 at epoch 3 (the reference
re-creates the optimizer; here it is a piecewise-constant optax schedule),
best-validation checkpointing. The loss is echoflow.train.losses.

Data parallelism: a 1-D `data` mesh; the train step is jitted with the batch
sharded over `data` and state replicated — XLA inserts the gradient
all-reduce over ICI. Note this makes BatchNorm statistics global (sync-BN);
the reference's DataParallel computed per-replica statistics. At batch 4 the
difference is within run-to-run noise, and sync-BN is the better-behaved
choice on a mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables
from echoflow.train.losses import (
    clasfv_total_loss,
    clasfv_total_loss_fused,
    ed_es_only_total_loss,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # Training RNG key, advanced every step and stored in checkpoints so a
    # resumed run reproduces the exact stochastic stream (SURVEY.md §5 —
    # the reference saves no RNG and cannot resume reproducibly).
    rng: Any = None


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    lr_drop_step: int | None = None   # step index of the epoch-3 LR drop
    lr_after_drop: float = 1e-5
    clip_length: int = 32
    image_size: tuple = (112, 112)
    batch_size: int = 4
    # Model compute dtype (params/optimizer stay fp32). Default fp32 — the
    # reference trains fp32 and bf16 changes the optimization trajectory
    # (measured on the round-3 unfused schedule: -12% step time,
    # 345 -> 304 ms, similar first-step loss,
    # but first-step Adam update cosine vs fp32 is only 0.45 — tiny
    # gradient sign flips dominate Adam's normalized update at init).
    # Opt-in via --compute-dtype bf16 for users who accept the tradeoff.
    compute_dtype: Any = jnp.float32


def lr_schedule(cfg: TrainConfig):
    """Piecewise-constant LR: the reference's manual epoch-3 optimizer
    re-creation (train notebook cell 10) as a schedule."""
    if cfg.lr_drop_step is None:
        return lambda step: cfg.lr
    return optax.piecewise_constant_schedule(
        init_value=cfg.lr,
        boundaries_and_scales={cfg.lr_drop_step: cfg.lr_after_drop / cfg.lr},
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(lr_schedule(cfg))


def create_train_state(rng: jax.Array, cfg: TrainConfig,
                       input_shape=None) -> tuple[R2Plus1DMotionSegNet, TrainState, optax.GradientTransformation]:
    # fp32 by default for training (31-deep warp chains; reference parity).
    model = R2Plus1DMotionSegNet(dtype=cfg.compute_dtype)
    if input_shape is None:
        input_shape = (1, 3, cfg.clip_length, *cfg.image_size)
    init_rng, train_rng = jax.random.split(rng)
    variables = init_variables(init_rng, model, input_shape)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=train_rng,
    )
    return model, state, tx


def _loss_fn(params, batch_stats, model, batch, remat: bool = False,
             fused_ota: bool = False):
    def forward(variables, video):
        return model.apply(variables, video, train=True, mutable=["batch_stats"])

    if remat:
        # Rematerialize the forward during the loss backward — trades FLOPs
        # for the activation memory of backprop through ~62 chained warps
        # (SURVEY.md §7.3); enables larger batches per chip.
        forward = jax.checkpoint(forward)

    (seg, motion), updates = forward(
        {"params": params, "batch_stats": batch_stats}, batch["video"])
    loss = clasfv_total_loss_fused if fused_ota else clasfv_total_loss
    total, aux = loss(
        batch["video"], seg, motion,
        batch["ed_label"], batch["es_label"], batch["ed_idx"], batch["es_idx"],
    )
    return total, (aux, updates["batch_stats"])


def make_train_step(model: R2Plus1DMotionSegNet, tx: optax.GradientTransformation,
                    remat: bool = False, fused_ota: bool = True):
    """Returns train_step(state, batch) -> (state, metrics). jit it with the
    batch sharded over the mesh's `data` axis for DP.

    `fused_ota` selects the OTA-in-scan loss formulation — identical math
    to the reference schedule up to fp summation order (value AND gradient
    equivalence pinned by tests/test_losses.py), but OTA's video warps share
    the per-step flow coordinates with the SGS/OTS label chains. Default ON:
    measured 279 ms vs 345 ms per full step (batch 4, 32x112x112, fp32,
    v5e — benchmarks/profile_train_step.py). Pass False for the literal
    reference compute schedule."""

    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (total, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, model, batch, remat, fused_ota)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": total, "ota": aux["ota"], "sgs": aux["sgs"],
            "ots": aux["ots"], "edes_bce": aux["edes_bce"],
            "ed_dice": _soft_lv_dice(aux["ed_logits"], batch["ed_label"]),
            "es_dice": _soft_lv_dice(aux["es_logits"], batch["es_label"]),
        }
        new_rng = (jax.random.fold_in(state.rng, state.step)
                   if state.rng is not None else None)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt,
                          rng=new_rng), metrics

    return train_step


def _ed_es_only_loss_fn(params, batch_stats, model, batch, remat: bool = False):
    """Loss for the ed-or-es-only recipe (reference
    `echonet_dynamic_ed_or_es_only_clip_R2plus1D.ipynb` cell 7): TWO forward
    passes per step — one on the ED-covering clips, one on the ES-covering
    clips — exactly as the reference runs them (two sequential model calls,
    so BatchNorm sees each clip set as its own batch)."""
    def forward(variables, video):
        return model.apply(variables, video, train=True, mutable=["batch_stats"])

    if remat:
        forward = jax.checkpoint(forward)

    variables = {"params": params, "batch_stats": batch_stats}
    (ed_seg, ed_motion), upd1 = forward(variables, batch["ed_video"])
    (es_seg, es_motion), upd2 = forward(
        {"params": params, "batch_stats": upd1["batch_stats"]}, batch["es_video"])
    total, aux = ed_es_only_total_loss(
        batch["ed_video"], batch["es_video"], ed_seg, ed_motion, es_seg,
        es_motion, batch["ed_label"], batch["es_label"],
        batch["ed_idx"], batch["es_idx"])
    return total, (aux, upd2["batch_stats"])


def make_ed_es_only_train_step(model: R2Plus1DMotionSegNet,
                               tx: optax.GradientTransformation,
                               remat: bool = False):
    """train_step(state, batch) -> (state, metrics) for the ed-or-es-only
    recipe. Batch keys: ed_video/es_video (N,3,T,H,W), ed_label/es_label
    (N,H,W), ed_idx/es_idx (N,) — indices WITHIN each clip."""

    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(_ed_es_only_loss_fn, has_aux=True)
        (total, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, model, batch, remat)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": total, "ota": aux["ota"], "flow": aux["flow"],
            "edes_bce": aux["edes_bce"],
            "ed_dice": _soft_lv_dice(aux["ed_logits"], batch["ed_label"]),
            "es_dice": _soft_lv_dice(aux["es_logits"], batch["es_label"]),
        }
        new_rng = (jax.random.fold_in(state.rng, state.step)
                   if state.rng is not None else None)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt,
                          rng=new_rng), metrics

    return train_step


def make_ed_es_only_eval_step(model: R2Plus1DMotionSegNet):
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ed_seg, ed_motion = model.apply(variables, batch["ed_video"], train=False)
        es_seg, es_motion = model.apply(variables, batch["es_video"], train=False)
        total, aux = ed_es_only_total_loss(
            batch["ed_video"], batch["es_video"], ed_seg, ed_motion, es_seg,
            es_motion, batch["ed_label"], batch["es_label"],
            batch["ed_idx"], batch["es_idx"])
        return {
            "loss": total,
            "ed_dice": _soft_lv_dice(aux["ed_logits"], batch["ed_label"]),
            "es_dice": _soft_lv_dice(aux["es_logits"], batch["es_label"]),
        }

    return eval_step


def make_eval_step(model: R2Plus1DMotionSegNet):
    def eval_step(state: TrainState, batch):
        seg, motion = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["video"], train=False)
        total, aux = clasfv_total_loss(
            batch["video"], seg, motion,
            batch["ed_label"], batch["es_label"], batch["ed_idx"], batch["es_idx"])
        return {
            "loss": total,
            "ed_dice": _soft_lv_dice(aux["ed_logits"], batch["ed_label"]),
            "es_dice": _soft_lv_dice(aux["es_logits"], batch["es_label"]),
        }

    return eval_step


def _soft_lv_dice(logits, label, eps: float = 1e-5):
    """Argmax LV dice of gathered ED/ES logits vs labels (the running metric
    the reference prints, train_test.py:96-100)."""
    pred = jnp.argmax(logits, axis=1)
    a = (pred == 1).astype(jnp.float32)
    b = (label == 1).astype(jnp.float32)
    return 2.0 * jnp.sum(a * b) / (jnp.sum(a) + jnp.sum(b) + eps)


def prefetch_to_device(batch_iterator, sharding, depth: int = 2):
    """Double-buffered host->HBM prefetch: keeps `depth` batches in flight
    (device_put is async) so the transfer of batch i+1 overlaps the device
    compute of batch i — the TPU analog of DataLoader worker prefetch
    (SURVEY.md §7.1)."""
    from collections import deque

    queue: deque = deque()
    for batch in batch_iterator:
        queue.append(jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def fit_on_mesh(mesh, model, state, tx, train_batches, eval_batches=None,
                log_every: int = 50, log_fn=print, metrics_logger=None,
                prefetch_depth: int = 2, step_factory=None,
                eval_step_factory=None, donate: bool = False):
    """Simple epoch runner over iterables of host batches, DP over `mesh`.

    train_batches / eval_batches: iterables yielding dicts of arrays whose
    leading axis is the batch (the default recipe's keys: video (N,3,T,H,W)
    f32, ed_label/es_label (N,H,W) int, ed_idx/es_idx (N,)). `step_factory`
    selects the recipe's train step (default `make_train_step`; pass
    `make_ed_es_only_train_step` for the two-clip recipe), and
    `eval_step_factory` the matching eval step (default `make_eval_step`).
    When `eval_batches` is given, one validation pass runs after the epoch
    on the final state; its batch-mean metrics are logged and appended to
    the returned history with an ``eval_`` prefix.

    With `donate=True` the train step donates its input state buffers
    (params/opt-state/batch-stats update in place — no fresh ~380 MB HBM
    allocation + copy of the state pytree every step), but this CONSUMES
    `state`: if the caller's pytree is already device-resident with the
    replicated sharding the entry `device_put` is a no-op, so the caller's
    own Arrays are invalidated by the first step ("Array has been deleted"
    on any later use). Use the *returned* state. The default is False so
    retained references stay valid; pass True on the hot path.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(mesh, P("data"))
    rsh = NamedSharding(mesh, P())
    train_step = jax.jit(
        (step_factory or make_train_step)(model, tx),
        in_shardings=(rsh, bsh), out_shardings=(rsh, rsh),
        donate_argnums=(0,) if donate else ())
    state = jax.device_put(state, rsh)

    history = []
    for i, batch in enumerate(
            prefetch_to_device(train_batches, bsh, prefetch_depth), 1):
        state, metrics = train_step(state, batch)
        if i % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            history.append(m)
            if metrics_logger is not None:
                metrics_logger.log(int(state.step), m)
            log_fn(f"step {i}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))

    if eval_batches is not None:
        eval_step = jax.jit((eval_step_factory or make_eval_step)(model),
                            in_shardings=(rsh, bsh))
        sums: dict = {}
        count = 0
        for batch in prefetch_to_device(eval_batches, bsh, prefetch_depth):
            for k, v in eval_step(state, batch).items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        if count:
            m = {f"eval_{k}": v / count for k, v in sums.items()}
            history.append(m)
            if metrics_logger is not None:
                metrics_logger.log(int(state.step), m)
            log_fn("eval: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
    return state, history
