"""Train-loop tests: loss decreases on synthetic data, LR schedule parity,
checkpoint roundtrip, and the multi-chip DP dry run on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echoflow.train.checkpoint import load_checkpoint, save_checkpoint
from echoflow.train.loop import (
    TrainConfig,
    create_train_state,
    lr_schedule,
    make_eval_step,
    make_train_step,
)


def _tiny_batch(n=2, t=8, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    ed_label = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2).astype(np.int32)
    es_label = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 6) ** 2).astype(np.int32)
    video = np.empty((n, 3, t, h, w), np.float32)
    for i in range(n):
        for k in range(t):
            r = (h / 3) - (h / 6) * k / (t - 1)
            m = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= r * r)
            video[i, :, k] = 0.2 + 0.6 * m + 0.05 * rng.randn(h, w)
    return {
        "video": jnp.asarray(np.clip(video, 0, 1)),
        "ed_label": jnp.asarray(np.stack([ed_label] * n)),
        "es_label": jnp.asarray(np.stack([es_label] * n)),
        "ed_idx": jnp.zeros((n,), jnp.int32),
        "es_idx": jnp.full((n,), t - 1, jnp.int32),
    }


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = TrainConfig(lr=1e-3, clip_length=8, image_size=(32, 32), batch_size=2)
    model, state, tx = create_train_state(
        jax.random.PRNGKey(0), cfg, input_shape=(1, 3, 8, 32, 32))
    return cfg, model, state, tx


@pytest.fixture(scope="module")
def jitted_step(tiny_setup):
    """One shared jitted train step: the model is the full fixed-topology
    31M-param network (reference parity forbids a width knob), so every
    fresh `jax.jit(make_train_step(...))` costs a full trace + CPU compile.
    Share it across the train tests."""
    cfg, model, state, tx = tiny_setup
    return jax.jit(make_train_step(model, tx))


def test_train_step_reduces_loss(tiny_setup, jitted_step):
    cfg, model, state, tx = tiny_setup
    step = jitted_step
    batch = _tiny_batch()
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_eval_step_runs(tiny_setup):
    cfg, model, state, tx = tiny_setup
    ev = jax.jit(make_eval_step(model))
    metrics = ev(state, _tiny_batch(seed=1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["ed_dice"]) <= 1.0


def test_lr_schedule_drop():
    cfg = TrainConfig(lr=1e-4, lr_drop_step=100, lr_after_drop=1e-5)
    sched = lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(99)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(101)), 1e-5, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    """Roundtrip semantics are model-agnostic (save_checkpoint pickles a
    class-independent dict of numpy pytrees), so a small synthetic state
    exercises them without pickling 380MB of full-model params."""
    from echoflow.train.loop import TrainState

    k = jax.random.PRNGKey(7)
    state = TrainState(
        step=jnp.asarray(5, jnp.int32),
        params={"a": {"kernel": jnp.arange(12.0).reshape(3, 4),
                      "bias": jnp.zeros((4,))}},
        batch_stats={"a": {"mean": jnp.ones((4,)), "var": jnp.full((4,), 2.0)}},
        opt_state=({"a": {"kernel": jnp.full((3, 4), 0.5),
                          "bias": jnp.full((4,), -1.0)}},),
        rng=k,
    )
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, state, extra={"epoch": 3})
    loaded, extra = load_checkpoint(path)
    assert extra["epoch"] == 3
    # Checkpoints store a class-independent dict; compare field by field
    # (a dict flattens in sorted-key order, a TrainState in field order —
    # comparing raw leaf lists would zip mismatched tensors).
    for field in ("step", "params", "batch_stats", "opt_state", "rng"):
        orig = jax.tree.leaves(jax.device_get(getattr(state, field)))
        back = jax.tree.leaves(loaded[field])
        assert len(orig) == len(back), field
        for a, b in zip(orig, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_step_matches(tiny_setup, jitted_step):
    cfg, model, state, tx = tiny_setup
    batch = _tiny_batch(seed=2)
    plain = jitted_step
    remat = jax.jit(make_train_step(model, tx, remat=True))
    _, m_plain = plain(state, batch)
    _, m_remat = remat(state, batch)
    np.testing.assert_allclose(float(m_plain["loss"]), float(m_remat["loss"]),
                               rtol=1e-5)


def test_prefetch_to_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from echoflow.parallel.mesh import data_mesh
    from echoflow.train.loop import prefetch_to_device

    mesh = data_mesh(2)
    sh = NamedSharding(mesh, P("data"))
    batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), sh, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("ECHOFLOW_RUN_DRIVER_GATES"),
    reason="duplicates the driver's own MULTICHIP gate (run every round, "
           "MULTICHIP_rNN.json); ~3.3 min of CPU compiles. Set "
           "ECHOFLOW_RUN_DRIVER_GATES=1 to run in-suite.")
def test_dryrun_multichip_8():
    """The driver's multichip gate, in-process (full train step + sharded
    inference on the 8-virtual-device mesh). The mesh-sharded engine and
    train-step code paths keep in-suite coverage via test_pipeline.py's
    mesh tests and the fit_on_mesh tests; this entry point itself is
    certified out-of-band by the driver every round."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_checkpoint_stores_rng_and_resume_is_reproducible(tiny_setup, jitted_step,
                                                          tmp_path):
    """SURVEY.md §5: a checkpoint must carry the RNG key so a resumed run
    reproduces the original — 2 straight steps == 1 step, save, restore,
    1 step."""
    from echoflow.train.checkpoint import restore_train_state

    cfg, model, state0, tx = tiny_setup
    assert state0.rng is not None
    step = jitted_step
    batch1, batch2 = _tiny_batch(seed=3), _tiny_batch(seed=4)

    s_mid, _ = step(state0, batch1)
    s_straight, _ = step(s_mid, batch2)

    path = str(tmp_path / "mid.pkl")
    save_checkpoint(path, s_mid, extra={"epoch": 0})
    s_restored, extra = restore_train_state(path)
    assert extra["epoch"] == 0
    np.testing.assert_array_equal(np.asarray(s_restored.rng), np.asarray(s_mid.rng))
    s_resumed, _ = step(s_restored, batch2)

    for a, b in zip(jax.tree.leaves(jax.device_get(s_straight.params)),
                    jax.tree.leaves(jax.device_get(s_resumed.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s_straight.rng),
                                  np.asarray(s_resumed.rng))


def test_nan_validation_never_saves_best():
    from train_clasfv import should_save_best

    assert should_save_best(1.0, float("inf"))
    assert should_save_best(0.5, 1.0)
    assert not should_save_best(float("nan"), 1.0)
    assert not should_save_best(float("nan"), float("inf"))
    assert not should_save_best(float("inf"), float("inf"))
    assert not should_save_best(2.0, 1.0)


@pytest.mark.slow
def test_train_clasfv_writes_last_checkpoint_and_restores_best_val(tmp_path):
    import train_clasfv
    from echoflow.train.checkpoint import load_checkpoint

    # Checkpoint semantics don't depend on model scale: clip 8 / image 24
    # keep the warp-scan graphs small (this test compiles the train step
    # twice on a 1-core host; at clip 32 / image 112 it alone took 8 min).
    # Batch stays 8 so the examples shard evenly over the 8-device mesh.
    out = str(tmp_path / "ckpt.pkl")
    train_clasfv.main(["--synthetic", "--epochs", "1", "--steps", "2",
                       "--batch-size", "8", "--image-size", "24",
                       "--clip-length", "8", "--out", out])
    # Best and last checkpoints both exist; last carries the epoch.
    _, extra_best = load_checkpoint(out)
    _, extra_last = load_checkpoint(out + ".last")
    assert extra_last["epoch"] == 0
    # Resume restores the best-val watermark (a worse second run must not
    # clobber the best checkpoint): run one more epoch resuming.
    train_clasfv.main(["--synthetic", "--epochs", "2", "--steps", "2",
                       "--batch-size", "8", "--image-size", "24",
                       "--clip-length", "8", "--out", out,
                       "--resume", out])
    _, extra2 = load_checkpoint(out)
    assert extra2["val_loss"] <= extra_best["val_loss"] + 1e-9


def test_fit_on_mesh_eval_pass_history_and_safe_default():
    """fit_on_mesh with eval_batches runs one validation pass on the final
    state (batch-mean metrics, `eval_` prefix, logged), and the default
    donate=False keeps the caller's device-resident state alive. Uses fake
    step factories so the loop logic is tested without a full-model
    compile."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from echoflow.parallel.mesh import data_mesh
    from echoflow.train.loop import fit_on_mesh

    mesh = data_mesh(1)
    rsh = NamedSharding(mesh, P())

    def step_factory(model, tx):
        def step(state, batch):
            return state + 1.0, {"loss": jnp.mean(batch["x"])}
        return step

    def eval_factory(model):
        def ev(state, batch):
            return {"loss": jnp.mean(batch["x"]) + 0.0 * state,
                    "ed_dice": jnp.float32(0.5)}
        return ev

    state0 = jax.device_put(jnp.float32(0.0), rsh)  # replicated + resident:
    # with donate=True the entry device_put would be identity and the first
    # step would invalidate state0 — the default must not.
    train = [{"x": np.full((2, 3), float(i), np.float32)} for i in range(4)]
    evalb = [{"x": np.full((2, 3), 10.0, np.float32)},
             {"x": np.full((2, 3), 20.0, np.float32)}]
    logs = []
    state, history = fit_on_mesh(
        mesh, None, state0, None, train, eval_batches=evalb,
        log_every=2, log_fn=logs.append, step_factory=step_factory,
        eval_step_factory=eval_factory)
    assert float(state) == 4.0
    assert len(history) == 3  # train logs at steps 2 and 4, then the eval entry
    assert history[-1] == {"eval_loss": 15.0, "eval_ed_dice": 0.5}
    assert any(line.startswith("eval:") for line in logs)
    assert float(state0) == 0.0  # donate defaults off: caller's state intact


@pytest.mark.slow
def test_bf16_compute_dtype_step_runs_and_is_finite():
    """Opt-in bf16 training (TrainConfig.compute_dtype / train_clasfv
    --compute-dtype bf16): params/optimizer stay fp32, the model computes in
    bf16, and a step produces finite loss and fp32 parameter updates.
    Default stays fp32 (reference-parity training dynamics; see the
    measured tradeoff note in train/loop.py)."""
    import jax.numpy as jnp

    cfg = TrainConfig(lr=1e-3, clip_length=8, image_size=(32, 32),
                      batch_size=2, compute_dtype=jnp.bfloat16)
    model, state, tx = create_train_state(
        jax.random.PRNGKey(0), cfg, input_shape=(1, 3, 8, 32, 32))
    assert model.dtype == jnp.bfloat16
    # Params are initialized fp32 regardless of compute dtype.
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
    step = jax.jit(make_train_step(model, tx))
    state2, metrics = step(state, _tiny_batch())
    assert np.isfinite(float(metrics["loss"]))
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state2.params))
