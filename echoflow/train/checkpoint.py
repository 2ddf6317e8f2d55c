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


def save_checkpoint(path: str, state, extra: dict | None = None):
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
