"""Training: CLAS-FV losses, DP loops, legacy harness, checkpointing.

`train_epoch` / `test_epoch` are the reference-named entry points
(src/train_test.py `train`/`test`); the mesh-parallel machinery lives in
echoflow.train.loop.
"""

from echoflow.train import losses, camus_losses, generic  # noqa: F401
from echoflow.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    restore_train_state,
    load_model_variables,
    save_checkpoint,
)
from echoflow.train.loop import (  # noqa: F401
    TrainConfig,
    TrainState,
    create_train_state,
    fit_on_mesh,
    make_eval_step,
    make_optimizer,
    make_train_step,
    prefetch_to_device,
)


def train_epoch(epoch, train_loader, model, state, tx, mesh=None, log_every=280,
                log_fn=print):
    """One training epoch (reference `train`, src/train_test.py:16-116).

    `train_loader` yields batch dicts (video, ed/es labels and indices —
    see echoflow.train.loop.fit_on_mesh); returns (state, history). The
    reference printed every 280 batches; same default here.
    """
    from echoflow.parallel.mesh import data_mesh

    mesh = mesh or data_mesh()
    state, history = fit_on_mesh(mesh, model, state, tx, train_loader,
                                 log_every=log_every, log_fn=log_fn)
    return state, history


def test_epoch(epoch, test_loader, model, state, log_fn=print):
    """One validation epoch (reference `test`, src/train_test.py:119-206).
    Returns the list of per-batch losses, printing the summary the way the
    reference does."""
    import numpy as np
    import jax

    eval_step = jax.jit(make_eval_step(model))
    losses_, ed_d, es_d = [], [], []
    for batch in test_loader:
        metrics = eval_step(state, jax.tree.map(jax.numpy.asarray, batch))
        losses_.append(float(metrics["loss"]))
        ed_d.append(float(metrics["ed_dice"]))
        es_d.append(float(metrics["es_dice"]))
    log_fn("-" * 30 + "Validation" + "-" * 30)
    log_fn("\nED LV: {:.3f}".format(np.mean(ed_d) if ed_d else float("nan")))
    log_fn("ES LV: {:.3f}".format(np.mean(es_d) if es_d else float("nan")))
    log_fn("\nValid set: Average loss: {:.4f}\n".format(
        np.mean(losses_) if losses_ else float("nan")))
    return losses_


# Reference-named aliases (src/train_test.py).
train = train_epoch
test = test_epoch
