"""Golden tests: CLAS-FV losses vs a torch reimplementation of the reference
loss math (loops of grid_sample warps), on small clips."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from echoflow.train.losses import (
    bce_with_logits,
    clasfv_total_loss,
    deformation_motion_loss,
    ed_es_only_total_loss,
    edes_supervised_loss,
    huber_smoothness,
    motion_seg_loss,
    single_label_motion_seg_loss_sample,
    soft_dice_loss,
)
from tests.test_warp import torch_reference_warp


def t_warp(img: torch.Tensor, flow: torch.Tensor) -> torch.Tensor:
    return torch.from_numpy(torch_reference_warp(img.numpy(), flow.numpy()))


def t_huber(x: torch.Tensor) -> torch.Tensor:
    b, _, h, w = x.shape
    dx = x[:, :, :, 1:] - x[:, :, :, :-1]
    dy = x[:, :, 1:, :] - x[:, :, :-1, :]
    err = (dx * dx).sum() / h + (dy * dy).sum() / w
    return torch.sqrt(0.01 + err / b)


def t_deform(video: torch.Tensor, motion: torch.Tensor) -> torch.Tensor:
    mse, smooth = 0.0, 0.0
    T = video.shape[2]
    for t in range(T - 1):
        fwd = motion[:, :2, t]
        bwd = motion[:, 2:, t + 1]
        mse = mse + F.mse_loss(t_warp(video[:, :, t], fwd), video[:, :, t + 1])
        mse = mse + F.mse_loss(t_warp(video[:, :, t + 1], bwd), video[:, :, t])
        smooth = smooth + t_huber(fwd) + t_huber(bwd)
    return (0.005 * smooth + mse) / 2 / (T - 1)


def t_dice(inputs: torch.Tensor, targets: torch.Tensor, smooth=1.0) -> torch.Tensor:
    i = inputs.reshape(-1)
    t = targets.reshape(-1)
    return 1 - (2 * (i * t).sum() + smooth) / (i.sum() + t.sum() + smooth)


def t_onehot(label: np.ndarray) -> torch.Tensor:
    # label (H, W) int -> (1, 2, H, W) float
    oh = np.stack([(label == 0), (label == 1)]).astype(np.float32)
    return torch.from_numpy(oh[None])


def t_motion_seg(label_ed, label_es, ed, es, motion, seg):
    """The reference motion_seg_loss (clasfv_losses.py:71-136) with
    BCE-with-logits criterion, single sample."""
    T = motion.shape[2]
    crit = F.binary_cross_entropy_with_logits
    fwd_loss = torch.tensor(0.0)
    bwd_loss = torch.tensor(0.0)
    ots = torch.tensor(0.0)

    src = t_onehot(label_ed)
    for t in range(ed, T - 1):
        nxt = t_warp(src, motion[:, :2, t])
        if t == es - 1:
            ots = ots + t_dice(nxt, t_onehot(label_es))
        else:
            fwd_loss = fwd_loss + crit(seg[:, :, t + 1], nxt)
        src = nxt

    src = t_onehot(label_es)
    for t in range(es, T - 1):
        nxt = t_warp(src, motion[:, :2, t])
        fwd_loss = fwd_loss + crit(seg[:, :, t + 1], nxt)
        src = nxt

    src = t_onehot(label_es)
    for t in range(es, 0, -1):
        nxt = t_warp(src, motion[:, 2:, t])
        if t == ed + 1:
            ots = ots + t_dice(nxt, t_onehot(label_ed))
        else:
            bwd_loss = bwd_loss + crit(seg[:, :, t - 1], nxt)
        src = nxt

    src = t_onehot(label_ed)
    for t in range(ed, 0, -1):
        nxt = t_warp(src, motion[:, 2:, t])
        bwd_loss = bwd_loss + crit(seg[:, :, t - 1], nxt)
        src = nxt

    return (fwd_loss + bwd_loss) / ((T - 2) * 2), ots / 2


@pytest.fixture
def clip(rng):
    n, t, h, w = 2, 6, 16, 16
    video = rng.rand(n, 3, t, h, w).astype(np.float32)
    motion = (0.1 * rng.randn(n, 4, t, h, w)).astype(np.float32)
    seg = rng.randn(n, 2, t, h, w).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    lab_ed = (((yy - 8) ** 2 + (xx - 8) ** 2) <= 25).astype(np.int32)
    lab_es = (((yy - 8) ** 2 + (xx - 8) ** 2) <= 9).astype(np.int32)
    labels_ed = np.stack([lab_ed] * n)
    labels_es = np.stack([lab_es] * n)
    return video, motion, seg, labels_ed, labels_es


def test_primitives_match_torch(rng):
    x = rng.randn(2, 2, 16, 16).astype(np.float32)
    np.testing.assert_allclose(
        float(huber_smoothness(jnp.asarray(x))), float(t_huber(torch.from_numpy(x))),
        rtol=1e-6)
    logits = rng.randn(1, 2, 8, 8).astype(np.float32)
    targets = rng.rand(1, 2, 8, 8).astype(np.float32)
    np.testing.assert_allclose(
        float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))),
        float(F.binary_cross_entropy_with_logits(torch.from_numpy(logits), torch.from_numpy(targets))),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(soft_dice_loss(jnp.asarray(targets), jnp.asarray(targets))),
        float(t_dice(torch.from_numpy(targets), torch.from_numpy(targets))),
        rtol=1e-6)


def test_deformation_motion_loss_matches(clip):
    video, motion, _, _, _ = clip
    ours = float(deformation_motion_loss(jnp.asarray(video), jnp.asarray(motion)))
    theirs = float(t_deform(torch.from_numpy(video), torch.from_numpy(motion)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("ed,es", [(1, 4), (0, 5), (2, 3), (0, 1)])
def test_motion_seg_loss_matches(clip, ed, es):
    video, motion, seg, labels_ed, labels_es = clip
    n = video.shape[0]
    sgs_t, ots_t = 0.0, 0.0
    for i in range(n):
        s, o = t_motion_seg(
            labels_ed[i], labels_es[i], ed, es,
            torch.from_numpy(motion[i : i + 1]), torch.from_numpy(seg[i : i + 1]))
        sgs_t += float(s)
        ots_t += float(o)
    sgs_t /= n
    ots_t /= n

    sgs_j, ots_j = motion_seg_loss(
        jnp.asarray(labels_ed), jnp.asarray(labels_es),
        jnp.full((n,), ed), jnp.full((n,), es),
        jnp.asarray(motion), jnp.asarray(seg))
    np.testing.assert_allclose(float(sgs_j), sgs_t, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(ots_j), ots_t, rtol=2e-5, atol=1e-6)


def test_edes_supervised_matches(clip):
    video, motion, seg, labels_ed, labels_es = clip
    n = seg.shape[0]
    ed_idx = np.array([1, 2])
    es_idx = np.array([4, 5])
    loss_j, _ = edes_supervised_loss(
        jnp.asarray(seg), jnp.asarray(labels_ed), jnp.asarray(labels_es),
        jnp.asarray(ed_idx), jnp.asarray(es_idx))
    ed_l = torch.from_numpy(np.stack([seg[i, :, ed_idx[i]] for i in range(n)]))
    es_l = torch.from_numpy(np.stack([seg[i, :, es_idx[i]] for i in range(n)]))
    oh_ed = torch.cat([t_onehot(labels_ed[i]) for i in range(n)])
    oh_es = torch.cat([t_onehot(labels_es[i]) for i in range(n)])
    want = (F.binary_cross_entropy_with_logits(ed_l, oh_ed)
            + F.binary_cross_entropy_with_logits(es_l, oh_es)) / 2
    np.testing.assert_allclose(float(loss_j), float(want), rtol=1e-5)


def t_single_label_motion_seg(label, label_index, motion, seg):
    """The ed-or-es-only notebook's single-label motion_seg_loss (cell 1):
    warp the one-hot label forward from label_index scoring seg[t+1], and
    backward from label_index scoring seg[t-1]; (fwd+bwd)/count."""
    T = motion.shape[2]
    crit = F.binary_cross_entropy_with_logits
    loss_fwd = torch.tensor(0.0)
    loss_bwd = torch.tensor(0.0)
    count = 0

    src = t_onehot(label)
    for t in range(label_index, T - 1):
        nxt = t_warp(src, motion[:, :2, t])
        loss_fwd = loss_fwd + crit(seg[:, :, t + 1], nxt)
        src = nxt
        count += 1
    src = t_onehot(label)
    for t in range(label_index, 0, -1):
        nxt = t_warp(src, motion[:, 2:, t])
        loss_bwd = loss_bwd + crit(seg[:, :, t - 1], nxt)
        src = nxt
        count += 1
    return (loss_fwd + loss_bwd) / count


@pytest.mark.slow
@pytest.mark.parametrize("label_idx", [0, 2, 5])
def test_single_label_motion_seg_loss_matches(clip, label_idx):
    _, motion, seg, labels_ed, _ = clip
    want = float(t_single_label_motion_seg(
        labels_ed[0], label_idx,
        torch.from_numpy(motion[:1]), torch.from_numpy(seg[:1])))
    got = float(single_label_motion_seg_loss_sample(
        jnp.asarray(labels_ed[0]), jnp.asarray(label_idx),
        jnp.asarray(motion[0]), jnp.asarray(seg[0])))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_ed_es_only_total_loss_matches(clip):
    """Full ed-or-es-only objective vs the notebook cell 7 math."""
    video, motion, seg, labels_ed, labels_es = clip
    n = video.shape[0]
    # Independent "clips" for ED and ES: reuse the fixture arrays shifted.
    ed_v, es_v = video, video[::-1].copy()
    ed_m, es_m = motion, (motion[::-1] * 0.9).copy()
    ed_s, es_s = seg, (seg[::-1] + 0.1).copy()
    ed_idx = np.array([1, 2])
    es_idx = np.array([4, 3])

    # Torch reference.
    want = float(t_deform(torch.from_numpy(ed_v), torch.from_numpy(ed_m))
                 + t_deform(torch.from_numpy(es_v), torch.from_numpy(es_m)))
    flow = 0.0
    for i in range(n):
        flow += float(t_single_label_motion_seg(
            labels_ed[i], int(ed_idx[i]),
            torch.from_numpy(ed_m[i:i + 1]), torch.from_numpy(ed_s[i:i + 1])))
        flow += float(t_single_label_motion_seg(
            labels_es[i], int(es_idx[i]),
            torch.from_numpy(es_m[i:i + 1]), torch.from_numpy(es_s[i:i + 1])))
    want += flow / n / 2
    ed_l = torch.from_numpy(np.stack([ed_s[i, :, ed_idx[i]] for i in range(n)]))
    es_l = torch.from_numpy(np.stack([es_s[i, :, es_idx[i]] for i in range(n)]))
    oh_ed = torch.cat([t_onehot(labels_ed[i]) for i in range(n)])
    oh_es = torch.cat([t_onehot(labels_es[i]) for i in range(n)])
    want += float((F.binary_cross_entropy_with_logits(ed_l, oh_ed)
                   + F.binary_cross_entropy_with_logits(es_l, oh_es)) / 2)

    got, aux = ed_es_only_total_loss(
        jnp.asarray(ed_v), jnp.asarray(es_v), jnp.asarray(ed_s),
        jnp.asarray(ed_m), jnp.asarray(es_s), jnp.asarray(es_m),
        jnp.asarray(labels_ed), jnp.asarray(labels_es),
        jnp.asarray(ed_idx), jnp.asarray(es_idx))
    np.testing.assert_allclose(float(got), want, rtol=2e-5, atol=1e-6)
    assert set(aux) >= {"ota", "flow", "edes_bce"}


@pytest.mark.slow
def test_total_loss_grad_flows(clip):
    video, motion, seg, labels_ed, labels_es = clip
    ed_idx = jnp.array([1, 1])
    es_idx = jnp.array([4, 4])

    def loss_fn(seg_m):
        seg_, mot_ = seg_m
        total, _ = clasfv_total_loss(
            jnp.asarray(video), seg_, mot_,
            jnp.asarray(labels_ed), jnp.asarray(labels_es), ed_idx, es_idx)
        return total

    g_seg, g_mot = jax.grad(loss_fn)((jnp.asarray(seg), jnp.asarray(motion)))
    assert np.isfinite(np.asarray(g_seg)).all()
    assert np.isfinite(np.asarray(g_mot)).all()
    assert float(jnp.abs(g_seg).max()) > 0
    assert float(jnp.abs(g_mot).max()) > 0


@pytest.mark.slow
def test_motion_seg_loss_randomized_ed_es_sweep(rng):
    """Randomized masking fuzz: 6 random (ed, es) index pairs on a longer
    clip (T=10) vs the literal torch chain loops — the per-sample dynamic
    start/stop masking (active_fn / ots_frame arithmetic) is where an
    off-by-one would hide."""
    n, t, h, w = 1, 10, 12, 12
    pairs = set()
    while len(pairs) < 6:
        ed = int(rng.randint(0, t - 1))
        es = int(rng.randint(ed + 1, t))
        pairs.add((ed, es))

    for ed, es in sorted(pairs):
        video = rng.rand(n, 3, t, h, w).astype(np.float32)
        motion = (0.1 * rng.randn(n, 4, t, h, w)).astype(np.float32)
        seg = rng.randn(n, 2, t, h, w).astype(np.float32)
        lab_ed = (rng.rand(h, w) > 0.6).astype(np.int32)
        lab_es = (rng.rand(h, w) > 0.8).astype(np.int32)

        sgs_t, ots_t = t_motion_seg(
            lab_ed, lab_es, ed, es,
            torch.from_numpy(motion), torch.from_numpy(seg))
        sgs_j, ots_j = motion_seg_loss(
            jnp.asarray(lab_ed[None]), jnp.asarray(lab_es[None]),
            jnp.full((n,), ed), jnp.full((n,), es),
            jnp.asarray(motion), jnp.asarray(seg))
        np.testing.assert_allclose(float(sgs_j), float(sgs_t), rtol=1e-4,
                                   err_msg=f"sgs ed={ed} es={es}")
        np.testing.assert_allclose(float(ots_j), float(ots_t), rtol=1e-4,
                                   atol=1e-6, err_msg=f"ots ed={ed} es={es}")


def test_fused_ota_loss_equals_unfused(clip):
    """clasfv_total_loss_fused (OTA warps fused into the SGS/OTS scan,
    round-3 verdict item 4) must match clasfv_total_loss in VALUE and in
    GRADIENT wrt (seg, motion) — the restructure only changes the compute
    schedule and fp summation order."""
    from echoflow.train.losses import clasfv_total_loss_fused

    video, motion, seg, labels_ed, labels_es = clip
    ed_idx = jnp.array([1, 2])
    es_idx = jnp.array([4, 3])
    args = (jnp.asarray(labels_ed), jnp.asarray(labels_es), ed_idx, es_idx)

    def run(loss_fn):
        def scalar(seg_m):
            total, aux = loss_fn(jnp.asarray(video), seg_m[0], seg_m[1], *args)
            return total, aux
        (total, aux), grads = jax.value_and_grad(scalar, has_aux=True)(
            (jnp.asarray(seg), jnp.asarray(motion)))
        return total, aux, grads

    t0, aux0, (gs0, gm0) = run(clasfv_total_loss)
    t1, aux1, (gs1, gm1) = run(clasfv_total_loss_fused)

    np.testing.assert_allclose(float(t1), float(t0), rtol=2e-6)
    for k in ("ota", "sgs", "ots", "edes_bce"):
        np.testing.assert_allclose(float(aux1[k]), float(aux0[k]), rtol=2e-6,
                                   atol=1e-7, err_msg=k)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs0),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm0),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_ota_train_step_matches(clip):
    """make_train_step(fused_ota=True) — the adopted default schedule —
    produces the same loss/metrics and (to fp tolerance) the same updated
    params as the reference-literal fused_ota=False step."""
    import optax

    from echoflow.train.loop import TrainConfig, create_train_state, make_train_step

    cfg = TrainConfig(clip_length=6, image_size=(16, 16), batch_size=2)
    model, state, tx = create_train_state(
        jax.random.PRNGKey(0), cfg, input_shape=(1, 3, 6, 16, 16))
    video, motion, seg, labels_ed, labels_es = clip
    batch = {
        "video": jnp.asarray(video),
        "ed_label": jnp.asarray(labels_ed), "es_label": jnp.asarray(labels_es),
        "ed_idx": jnp.array([1, 2]), "es_idx": jnp.array([4, 3]),
    }
    # fused_ota=False is the reference-literal schedule; True (the adopted
    # default) must match it — pass both explicitly so the test keeps
    # comparing the two schedules whatever the default is.
    s0, m0 = jax.jit(make_train_step(model, tx, fused_ota=False))(state, batch)
    s1, m1 = jax.jit(make_train_step(model, tx, fused_ota=True))(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-5)
    for k in ("ota", "sgs", "ots", "edes_bce"):
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-5,
                                   atol=1e-7, err_msg=k)
    # Adam's first update is ~lr * sign(grad): a near-zero gradient whose
    # fp-noise sign differs between the two (equivalent) formulations moves
    # its param by up to 2*lr in opposite directions, so the honest
    # post-Adam bound is an absolute one of 2*lr (+ slack), not a rtol.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=0, atol=2.2e-4),
        s1.params, s0.params)
