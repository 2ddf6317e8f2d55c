"""Checkpointing.

The reference saves `{"model": state_dict, "optimizer": state_dict}` on best
validation loss and restores with `load_state_dict(torch.load(p)["model"])`
(train notebook cell 10; motion_segment.py:72) — no step, no RNG. Here a
checkpoint is the full training state: params, batch_stats, optimizer state,
step, and RNG key, stored as a pickled pure-numpy pytree (host-portable, no
framework version coupling). `.pth` checkpoints from the reference are
loaded transparently through the weight converter.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np


_STATE_FIELDS = ("step", "params", "batch_stats", "opt_state", "rng")


def save_checkpoint(path: str, state, extra: dict | None = None):
    """state: a TrainState (or any object with the _STATE_FIELDS attrs) or a
    plain dict. Stored as a class-independent dict of numpy pytrees so
    checkpoints survive TrainState schema changes."""
    if not isinstance(state, dict):
        state = {f: getattr(state, f, None) for f in _STATE_FIELDS}
    payload = {
        "state": jax.tree.map(np.asarray, jax.device_get(state)),
        "extra": extra or {},
    }
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["state"], payload.get("extra", {})


def restore_train_state(path: str):
    """Load a checkpoint back into a TrainState (step/params/stats/opt/RNG)
    for reproducible resume. Returns (state, extra)."""
    from echoflow.train.loop import TrainState

    state, extra = load_checkpoint(path)
    if not isinstance(state, dict):  # legacy pickled-TrainState checkpoints
        state = {f: getattr(state, f, None) for f in _STATE_FIELDS}
    return TrainState(**{f: state.get(f) for f in _STATE_FIELDS}), extra


def load_model_variables(path: str) -> dict:
    """Load inference variables from any supported checkpoint format:

    - reference `.pth` (torch) -> converted (echoflow.models.convert)
    - echoflow `.pkl` training checkpoint -> {params, batch_stats}
    """
    if str(path).endswith(".pth"):
        from echoflow.models.convert import load_reference_checkpoint

        return load_reference_checkpoint(path)
    state, _ = load_checkpoint(path)
    if isinstance(state, dict) and "params" in state:
        return {"params": state["params"], "batch_stats": state["batch_stats"]}
    return {"params": state.params, "batch_stats": state.batch_stats}
