"""Model-level gates (SURVEY.md §7.2 step 2): exact parameter count and
per-stage feature shapes matching reference R2plus1D_18_MotionNet.py:28-49."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echoflow.models.r2plus1d import (

    R2Plus1DBackbone,
    R2Plus1DMotionSegNet,
    init_variables,
    midplanes,
    param_count,
)

# Full-model CPU compiles: minutes on this 1-core host (see pytest.ini).
pytestmark = pytest.mark.slow


def test_midplanes_rule():
    assert midplanes(64, 64) == 144
    assert midplanes(64, 128) == 230
    assert midplanes(128, 128) == 288
    assert midplanes(128, 256) == 460
    assert midplanes(256, 256) == 576
    assert midplanes(256, 512) == 921
    assert midplanes(512, 512) == 1152


def test_param_count_matches_reference():
    model = R2Plus1DMotionSegNet()
    # Tiny spatial/temporal size: params are shape-independent.
    variables = init_variables(jax.random.PRNGKey(0), model, (1, 3, 8, 16, 16))
    assert param_count(variables) == 31_575_731  # reference notebook cell 4


def test_backbone_tap_shapes():
    model = R2Plus1DBackbone()
    x = jnp.zeros((1, 16, 32, 32, 3))  # NTHWC, T=16, 32x32 spatial
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    taps = model.apply(variables, x, train=False)
    # stem (T, H/2, W/2, 64); layer1 same; then /2 per stage.
    shapes = [tuple(t.shape) for t in taps]
    assert shapes == [
        (1, 16, 16, 16, 64),
        (1, 16, 16, 16, 64),
        (1, 8, 8, 8, 128),
        (1, 4, 4, 4, 256),
        (1, 2, 2, 2, 512),
    ]


def test_forward_output_contract():
    model = R2Plus1DMotionSegNet()
    variables = init_variables(jax.random.PRNGKey(0), model, (1, 3, 8, 16, 16))
    video = jnp.asarray(np.random.RandomState(0).rand(2, 3, 8, 16, 16), jnp.float32)
    seg, motion = model.apply(variables, video, train=False)
    assert seg.shape == (2, 2, 8, 16, 16)
    assert motion.shape == (2, 4, 8, 16, 16)
    assert seg.dtype == jnp.float32 and motion.dtype == jnp.float32
    m = np.asarray(motion)
    assert np.all(m >= -1.0) and np.all(m <= 1.0)  # tanh-bounded
    # Freshly initialized motion head (std sqrt(1e-5)) produces tiny fields.
    assert np.abs(m).mean() < 0.05


def test_train_mode_updates_batch_stats():
    model = R2Plus1DMotionSegNet()
    variables = init_variables(jax.random.PRNGKey(0), model, (1, 3, 8, 16, 16))
    video = jnp.asarray(np.random.RandomState(1).rand(1, 3, 8, 16, 16), jnp.float32)
    (seg, motion), updates = model.apply(
        variables, video, train=True, mutable=["batch_stats"]
    )
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed


def test_bfloat16_fast_path():
    model = R2Plus1DMotionSegNet(dtype=jnp.bfloat16)
    variables = init_variables(jax.random.PRNGKey(0), model, (1, 3, 8, 16, 16))
    video = jnp.ones((1, 3, 8, 16, 16), jnp.float32)
    seg, motion = model.apply(variables, video, train=False)
    assert seg.dtype == jnp.float32  # outputs are upcast at the boundary
    assert np.isfinite(np.asarray(seg)).all()
