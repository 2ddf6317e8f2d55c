"""CLAS-FV training losses, TPU-native.

Reference semantics (src/clasfv_losses.py, src/loss_functions.py,
src/train_test.py:33-88):

  total = OTA + mean_i(SGS_i) + mean_i(OTS_i) + ED/ES supervised BCE

  - OTA (`deformation_motion_loss`, clasfv_losses.py:29-57): for every
    adjacent frame pair, warp frame t by its forward flow and frame t+1 by
    its backward flow; MSE against the real neighbor + 0.005 x huber
    smoothness of each flow; total / 2 / (T-1). The reference runs a Python
    loop of 31 sequential warps — here all pairs fold into one batched warp
    (no sequential dependency exists).
  - SGS/OTS (`motion_seg_loss`, clasfv_losses.py:71-136): chain-warp the
    one-hot ED label forward to the clip end and the ES label backward to
    the start (plus ES-forward and ED-backward chains); at the ES (resp. ED)
    arrival frame score Dice vs the true label (OTS); at every other frame
    in range score the frame's segmentation logits against the warped
    pseudo-label with BCE-with-logits (SGS). Chains *are* sequential, so
    they become `lax.scan`s over time with per-sample dynamic ED/ES indices
    handled by masking (start/stop data-dependence would break jit).
    Normalization matches the reference exactly: SGS / ((T-2)*2), OTS / 2 —
    constants, independent of how many terms were actually accumulated.
  - ED/ES BCE (train_test.py:78-88): BCE-with-logits of the gathered ED/ES
    frame logits against one-hot clinical labels, averaged over the two.

All functions are pure and jit/vmap/grad-safe; fp32 recommended (the warp
chains are 31 deep — see SURVEY.md §7.3 on backprop through chained warps).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from echoflow.ops.normalize import one_hot_channels
from echoflow.ops.warp import warp_image_with_offsets


def soft_dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Flat soft Dice loss (reference clasfv_losses.py:11-26)."""
    x = inputs.reshape(-1)
    y = targets.reshape(-1)
    inter = jnp.sum(x * y)
    dice = (2.0 * inter + smooth) / (jnp.sum(x) + jnp.sum(y) + smooth)
    return 1.0 - dice


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (torch semantics)."""
    z = logits
    y = targets
    return jnp.mean(jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))


def huber_smoothness(flow: jnp.ndarray) -> jnp.ndarray:
    """TV-flavored smoothness penalty of a (N, 2, H, W) flow field
    (reference loss_functions.py:66-77): sqrt(0.01 + sum(dx^2)/H +
    sum(dy^2)/W) with the inner sums also divided by batch size."""
    n, _, h, w = flow.shape
    dx = flow[:, :, :, 1:] - flow[:, :, :, :-1]
    dy = flow[:, :, 1:, :] - flow[:, :, :-1, :]
    err = jnp.sum(dx * dx) / h + jnp.sum(dy * dy) / w
    return jnp.sqrt(0.01 + err / n)


def _huber_flow_smoothness(flow_pairs: jnp.ndarray) -> jnp.ndarray:
    """Summed per-pair huber flow smoothness of (N, T-1, 2, H, W) flow
    pairs: sum_t sqrt(0.01 + (sum dx^2 / H + sum dy^2 / W) / N) — exactly
    how the reference's OTA loop accumulates `huber_smoothness` per frame
    pair (loss_functions.py:80-101). This is the single source of truth for
    the reduction: `deformation_motion_loss` and the fused schedule's
    `_ota_smoothness` both call it, so their tested value+grad equivalence
    cannot drift apart."""
    n, _, _, h, w = flow_pairs.shape
    dx = flow_pairs[..., :, 1:] - flow_pairs[..., :, :-1]
    dy = flow_pairs[..., 1:, :] - flow_pairs[..., :-1, :]
    err = (jnp.sum(dx * dx, axis=(0, 2, 3, 4)) / h
           + jnp.sum(dy * dy, axis=(0, 2, 3, 4)) / w)
    return jnp.sum(jnp.sqrt(0.01 + err / n))


def deformation_motion_loss(video: jnp.ndarray, motion: jnp.ndarray) -> jnp.ndarray:
    """OTA loss. video (N, C, T, H, W), motion (N, 4, T, H, W) -> scalar.

    Batched formulation: both warps of all (T-1) frame pairs run as one
    (N*(T-1))-batch warp; per-pair MSE means and per-pair huber terms are
    then reduced exactly as the reference's loop accumulates them.
    """
    n, c, t, h, w = video.shape
    src_fwd = jnp.moveaxis(video[:, :, :-1], 2, 1).reshape(n * (t - 1), c, h, w)
    src_bwd = jnp.moveaxis(video[:, :, 1:], 2, 1).reshape(n * (t - 1), c, h, w)
    flow_fwd = jnp.moveaxis(motion[:, :2, :-1], 2, 1).reshape(n * (t - 1), 2, h, w)
    flow_bwd = jnp.moveaxis(motion[:, 2:, 1:], 2, 1).reshape(n * (t - 1), 2, h, w)

    pred_fwd = warp_image_with_offsets(src_fwd, flow_fwd)
    pred_bwd = warp_image_with_offsets(src_bwd, flow_bwd)

    # Sum over pairs of per-pair means == (T-1) * overall mean.
    mse = (t - 1) * (jnp.mean((pred_fwd - src_bwd) ** 2) + jnp.mean((pred_bwd - src_fwd) ** 2))

    # Per-pair huber: reshape back to (N, T-1, ...) and reduce pairwise.
    smooth = (_huber_flow_smoothness(flow_fwd.reshape(n, t - 1, 2, h, w))
              + _huber_flow_smoothness(flow_bwd.reshape(n, t - 1, 2, h, w)))
    return (0.005 * smooth + mse) / 2.0 / (t - 1)


def _chain_scan(init_label, motion_flows, seg_logits, frame_ids, active_fn,
                ots_frame, ots_target, loss_frame_offset, criterion):
    """One masked warp chain.

    init_label: (2, H, W) one-hot start label.
    motion_flows: (S, 2, H, W) per-step flow (already ordered along the scan).
    seg_logits: (2, T, H, W).
    frame_ids: (S,) the reference loop's `frame_index` per step.
    active_fn: frame_index -> bool (in-chain mask).
    ots_frame: frame_index at which OTS fires (or -1) — at that step the
        warped label is scored against `ots_target` with Dice instead of the
        per-frame criterion.
    loss_frame_offset: +1 (forward chains score frame t+1) or -1 (backward).
    """

    def step(carry, inp):
        label = carry
        flow, fid = inp
        warped = warp_image_with_offsets(label[None], flow[None])[0]
        active = active_fn(fid)
        new_label = jnp.where(active, warped, label)

        is_ots = active & (fid == ots_frame)
        ots_term = jnp.where(is_ots, soft_dice_loss(warped, ots_target), 0.0)

        frame_logits = jax.lax.dynamic_index_in_dim(
            seg_logits, fid + loss_frame_offset, axis=1, keepdims=False
        )  # (2, H, W)
        sgs_term = jnp.where(active & ~is_ots, criterion(frame_logits, warped), 0.0)
        return new_label, (sgs_term, ots_term)

    _, (sgs_terms, ots_terms) = jax.lax.scan(step, init_label, (motion_flows, frame_ids))
    return jnp.sum(sgs_terms), jnp.sum(ots_terms)


def _edes_chain_table(label_ed, label_es, ed_idx, es_idx, motion):
    """The reference's four chained-warp loops (clasfv_losses.py:84-130) as
    one data table: A fwd-from-ED (OTS at ES arrival), B fwd-from-ES,
    C bwd-from-ES (OTS at ED arrival), D bwd-from-ED. Single source of
    truth for both loss schedules — `motion_seg_loss_single` and the
    fused-OTA `_fused_chain_ota_single` consume the SAME table, so their
    tested equivalence cannot drift through a one-sided chain edit.

    Returns (fwd_flows, fwd_ids, bwd_flows, bwd_ids, table) where flows
    are (T-1, 2, H, W) in scan-step order (forward step i uses flow i;
    backward step i uses the flow at frame T-1-i) and `table` holds the
    per-chain constants."""
    t = motion.shape[1]
    oh_ed = one_hot_channels(label_ed[None, None], 2)[0]  # (2, H, W)
    oh_es = one_hot_channels(label_es[None, None], 2)[0]

    fwd_flows = jnp.moveaxis(motion[:2, :-1], 1, 0)       # step i: flow i
    fwd_ids = jnp.arange(t - 1)
    bwd_flows = jnp.moveaxis(motion[2:, 1:], 1, 0)[::-1]  # step i: flow T-1-i
    bwd_ids = jnp.arange(t - 1, 0, -1)

    table = {
        "init_labels": jnp.stack([oh_ed, oh_es, oh_es, oh_ed]),  # (4, 2, H, W)
        "start_ids": jnp.stack([ed_idx, es_idx, es_idx, ed_idx]),
        "ots_frames": jnp.stack([es_idx - 1, -1, ed_idx + 1, -1]),
        "ots_targets": jnp.stack([oh_es, oh_es, oh_ed, oh_ed]),
        "directions": jnp.asarray([1, 1, -1, -1]),   # active-side sign
        "offsets": jnp.asarray([1, 1, -1, -1]),      # scored frame offset
    }
    return fwd_flows, fwd_ids, bwd_flows, bwd_ids, table


def _chain_step_terms(tbl, labels, warped, fid, seg_logits, criterion):
    """Shared per-step bookkeeping of the 4-wide chain scan: chain-activity
    masking, label carry, the OTS Dice term at the arrival frame, and the
    SGS criterion against the offset frame's logits. Both loss schedules
    route their (differently computed) `warped` labels through this one
    function. Returns (new_labels, sgs_terms, ots_terms)."""
    active = jnp.where(tbl["directions"] > 0,
                       fid >= tbl["start_ids"], fid <= tbl["start_ids"])
    new_labels = jnp.where(active[:, None, None, None], warped, labels)

    is_ots = active & (fid == tbl["ots_frames"])
    ots_terms = jnp.where(
        is_ots, jax.vmap(soft_dice_loss)(warped, tbl["ots_targets"]), 0.0)

    frame_logits = jax.vmap(
        lambda f: jax.lax.dynamic_index_in_dim(seg_logits, f, axis=1, keepdims=False)
    )(fid + tbl["offsets"])  # (4, 2, H, W)
    sgs_each = jax.vmap(criterion)(frame_logits, warped)
    sgs_terms = jnp.where(active & ~is_ots, sgs_each, 0.0)
    return new_labels, sgs_terms, ots_terms


def motion_seg_loss_single(label_ed, label_es, ed_idx, es_idx, motion, seg_logits,
                           criterion=bce_with_logits):
    """Per-sample SGS + OTS. label_* (H, W) int; motion (4, T, H, W);
    seg_logits (2, T, H, W); ed_idx/es_idx scalars. Returns (sgs, ots).

    The reference runs four independent chained-warp loops
    (clasfv_losses.py:84-130). The four chains are mutually independent, so
    all of them run inside ONE scan of T-1 steps (the backward chains
    simply consume the backward flows in reversed order) with a 4-wide
    chain axis — identical math, a quarter of the sequential depth, 4x the
    warp batch per step."""
    t = motion.shape[1]
    fwd_flows, fwd_ids, bwd_flows, bwd_ids, tbl = _edes_chain_table(
        label_ed, label_es, ed_idx, es_idx, motion)

    flows = jnp.stack([fwd_flows, fwd_flows, bwd_flows, bwd_flows], axis=1)  # (T-1, 4, 2, H, W)
    fids = jnp.stack([fwd_ids, fwd_ids, bwd_ids, bwd_ids], axis=1)           # (T-1, 4)

    def step(labels, inp):
        flow, fid = inp  # (4, 2, H, W), (4,)
        warped = warp_image_with_offsets(labels, flow)
        new_labels, sgs_terms, ots_terms = _chain_step_terms(
            tbl, labels, warped, fid, seg_logits, criterion)
        return new_labels, (sgs_terms, ots_terms)

    _, (sgs_terms, ots_terms) = jax.lax.scan(step, tbl["init_labels"], (flows, fids))
    sgs = jnp.sum(sgs_terms) / ((t - 2) * 2)
    ots = jnp.sum(ots_terms) / 2.0
    return sgs, ots


def motion_seg_loss(label_ed, label_es, ed_idx, es_idx, motion, seg_logits,
                    criterion=bce_with_logits):
    """Batched SGS/OTS: vmap over samples, mean over the batch (the
    reference sums per-sample losses and divides by batch size,
    train_test.py:39-63). label_* (N, H, W) int; motion (N, 4, T, H, W);
    seg_logits (N, 2, T, H, W); ed_idx/es_idx (N,) int arrays."""
    fn = partial(motion_seg_loss_single, criterion=criterion)
    sgs, ots = jax.vmap(fn)(label_ed, label_es, ed_idx, es_idx, motion, seg_logits)
    return jnp.mean(sgs), jnp.mean(ots)


def single_label_motion_seg_loss_sample(label, label_idx, motion, seg_logits,
                                        criterion=bce_with_logits):
    """Single-label warp-chain loss of the ed-or-es-only training recipe
    (reference `echonet_dynamic_ed_or_es_only_clip_R2plus1D.ipynb` cell 1,
    `motion_seg_loss(label, label_index, ...)`): warp the one-hot label
    forward from `label_idx` to the clip end, scoring each warped label
    against the NEXT frame's segmentation logits, and backward from
    `label_idx` to the clip start, scoring against the PREVIOUS frame's
    logits. There is no OTS term (only one label exists per clip); the sum
    is divided by the step count, which is (end-1) - label_idx forward plus
    label_idx - start backward = T-1 always — a static constant, so the
    dynamic `label_idx` only moves the chain masks.

    label (H, W) int; motion (4, T, H, W); seg_logits (2, T, H, W);
    label_idx scalar int. Returns a scalar. Both chains run in ONE masked
    scan of T-1 steps with a 2-wide chain axis (same trick as
    motion_seg_loss_single)."""
    t = motion.shape[1]
    oh = one_hot_channels(label[None, None], 2)[0]  # (2, H, W)

    fwd_flows = jnp.moveaxis(motion[:2, :-1], 1, 0)       # step i: fwd flow i
    fwd_ids = jnp.arange(t - 1)
    bwd_flows = jnp.moveaxis(motion[2:, 1:], 1, 0)[::-1]  # step i: bwd flow T-1-i
    bwd_ids = jnp.arange(t - 1, 0, -1)

    init_labels = jnp.stack([oh, oh])                     # (2, 2, H, W)
    directions = jnp.asarray([1, -1])
    offsets = jnp.asarray([1, -1])

    flows = jnp.stack([fwd_flows, bwd_flows], axis=1)     # (T-1, 2, 2, H, W)
    fids = jnp.stack([fwd_ids, bwd_ids], axis=1)          # (T-1, 2)

    def step(labels, inp):
        flow, fid = inp
        warped = warp_image_with_offsets(labels, flow)
        active = jnp.where(directions > 0, fid >= label_idx, fid <= label_idx)
        new_labels = jnp.where(active[:, None, None, None], warped, labels)
        frame_logits = jax.vmap(
            lambda f: jax.lax.dynamic_index_in_dim(seg_logits, f, axis=1, keepdims=False)
        )(fid + offsets)
        terms = jnp.where(active, jax.vmap(criterion)(frame_logits, warped), 0.0)
        return new_labels, terms

    _, terms = jax.lax.scan(step, init_labels, (flows, fids))
    return jnp.sum(terms) / (t - 1)


def ed_es_only_total_loss(ed_video, es_video, ed_seg, ed_motion, es_seg,
                          es_motion, label_ed, label_es, ed_idx, es_idx):
    """The full ed-or-es-only objective (reference notebook cell 7 `train`):

      total = [OTA(ed clip) + OTA(es clip)]
            + sum_i[single(ed_i) + single(es_i)] / N / 2
            + [BCE(ed logits @ ed_idx) + BCE(es logits @ es_idx)] / 2

    Each sample contributes TWO independent 32-frame clips — one whose
    window covers the ED frame, one covering ES — each with its own forward
    pass. Inputs: *_video (N,3,T,H,W), *_seg (N,2,T,H,W), *_motion
    (N,4,T,H,W), label_* (N,H,W) int, *_idx (N,) clip-frame indices of the
    labeled frame within its own clip. Returns (total, aux dict)."""
    ota = (deformation_motion_loss(ed_video, ed_motion)
           + deformation_motion_loss(es_video, es_motion))

    single = jax.vmap(partial(single_label_motion_seg_loss_sample,
                              criterion=bce_with_logits))
    flow = (jnp.sum(single(label_ed, ed_idx, ed_motion, ed_seg))
            + jnp.sum(single(label_es, es_idx, es_motion, es_seg)))
    flow = flow / ed_video.shape[0] / 2.0

    ed_sup, (ed_logits, _) = edes_supervised_loss(
        ed_seg, label_ed, label_ed, ed_idx, ed_idx)
    es_sup, (es_logits, _) = edes_supervised_loss(
        es_seg, label_es, label_es, es_idx, es_idx)
    # edes_supervised_loss already averages its two (identical) halves, so
    # ed_sup == BCE(ed logits); the recipe's /2 is the mean of the two clips.
    edes = (ed_sup + es_sup) / 2.0

    total = ota + flow + edes
    aux = {"ota": ota, "flow": flow, "edes_bce": edes,
           "ed_logits": ed_logits, "es_logits": es_logits}
    return total, aux


def _ota_smoothness(motion):
    """The huber flow-smoothness half of OTA, reduced by the same
    `_huber_flow_smoothness` that `deformation_motion_loss` uses. motion
    (N, 4, T, H, W) -> scalar (the un-scaled smooth term)."""
    flow_fwd = jnp.moveaxis(motion[:, :2, :-1], 2, 1)  # (N, T-1, 2, H, W)
    flow_bwd = jnp.moveaxis(motion[:, 2:, 1:], 2, 1)
    return _huber_flow_smoothness(flow_fwd) + _huber_flow_smoothness(flow_bwd)


def _fused_chain_ota_single(video, label_ed, label_es, ed_idx, es_idx, motion,
                            seg_logits, criterion=bce_with_logits):
    """Per-sample SGS/OTS chains with OTA's frame warps FUSED into the same
    scan (round-3 verdict item 4).

    Key observation: OTA's (T-1) forward warps use exactly the per-step
    forward flows the A/B label chains consume, and its (T-1) backward
    warps use the backward flows the C/D chains consume (in the same
    reversed order). Fusing them means the flow -> sample-coordinate math
    is computed ONCE per direction per step (XLA CSE merges the two warp
    calls' identical coordinate subgraphs) instead of once for every label
    chain entry plus again for the standalone OTA batch; the video warp's
    image-gradient kernel is dead (video is data) and DCE'd because it is
    a separate call. Math is identical to motion_seg_loss_single +
    deformation_motion_loss's MSE half up to fp summation order.

    Returns (sgs, ots, mse_sum) — mse_sum is the RAW squared-error sum of
    both OTA warp directions for this sample; the caller normalizes.
    """
    t = motion.shape[1]
    fwd_flows, fwd_ids, bwd_flows, bwd_ids, tbl = _edes_chain_table(
        label_ed, label_es, ed_idx, es_idx, motion)

    # OTA pairs, aligned to the scan's step order: forward step i warps
    # frame i toward frame i+1; backward step i warps frame T-1-i toward
    # frame T-2-i (deformation_motion_loss's pairs, bwd set reversed).
    vid = jnp.moveaxis(video, 1, 0)                       # (T, 3, H, W)
    vf_src, vf_tgt = vid[:-1], vid[1:]
    vb_src, vb_tgt = vid[1:][::-1], vid[:-1][::-1]

    xs = (fwd_flows, bwd_flows, vf_src, vf_tgt, vb_src, vb_tgt,
          jnp.stack([fwd_ids, fwd_ids, bwd_ids, bwd_ids], axis=1))

    def step(labels, inp):
        fflow, bflow, f_src, f_tgt, b_src, b_tgt, fid = inp
        flows = jnp.stack([fflow, bflow])                    # (2, 2, H, W)
        # One 4-channel label entry per direction (A|B share the fwd
        # coords, C|D the bwd coords) + one 3-channel video entry per
        # direction sharing the SAME flows (coords CSE'd; dimg DCE'd).
        lab_stack = jnp.stack([
            jnp.concatenate([labels[0], labels[1]], axis=0),
            jnp.concatenate([labels[2], labels[3]], axis=0),
        ])                                                   # (2, 4, H, W)
        warped_lab = warp_image_with_offsets(lab_stack, flows)
        warped_vid = warp_image_with_offsets(
            jax.lax.stop_gradient(jnp.stack([f_src, b_src])), flows)
        warped = jnp.stack([warped_lab[0, :2], warped_lab[0, 2:],
                            warped_lab[1, :2], warped_lab[1, 2:]])

        mse_step = (jnp.sum((warped_vid[0] - f_tgt) ** 2)
                    + jnp.sum((warped_vid[1] - b_tgt) ** 2))

        new_labels, sgs_terms, ots_terms = _chain_step_terms(
            tbl, labels, warped, fid, seg_logits, criterion)
        return new_labels, (sgs_terms, ots_terms, mse_step)

    _, (sgs_terms, ots_terms, mse_steps) = jax.lax.scan(
        step, tbl["init_labels"], xs)
    sgs = jnp.sum(sgs_terms) / ((t - 2) * 2)
    ots = jnp.sum(ots_terms) / 2.0
    return sgs, ots, jnp.sum(mse_steps)


def clasfv_total_loss_fused(video, seg_logits, motion, label_ed, label_es,
                            ed_idx, es_idx):
    """`clasfv_total_loss` with OTA's warps fused into the SGS/OTS scan
    (see `_fused_chain_ota_single`). Identical math up to fp summation
    order (equivalence pinned by tests/test_losses.py); selected by
    `make_train_step(..., fused_ota=True)` when the measured step time
    favors it."""
    n, c, t, h, w = video.shape
    sgs, ots, mse_sums = jax.vmap(
        _fused_chain_ota_single)(video, label_ed, label_es, ed_idx, es_idx,
                                 motion, seg_logits)
    sgs, ots = jnp.mean(sgs), jnp.mean(ots)

    # OTA normalization identical to deformation_motion_loss:
    # (t-1) * (mean_fwd + mean_bwd) == sum_sq / (N * C * H * W).
    mse = jnp.sum(mse_sums) / (n * c * h * w)
    ota = (0.005 * _ota_smoothness(motion) + mse) / 2.0 / (t - 1)

    edes, (ed_logits, es_logits) = edes_supervised_loss(
        seg_logits, label_ed, label_es, ed_idx, es_idx)
    total = ota + sgs + ots + edes
    aux = {
        "ota": ota, "sgs": sgs, "ots": ots, "edes_bce": edes,
        "ed_logits": ed_logits, "es_logits": es_logits,
    }
    return total, aux


def edes_supervised_loss(seg_logits, label_ed, label_es, ed_idx, es_idx):
    """Supervised BCE at the clinically labeled ED/ES frames
    (train_test.py:65-88). Returns the averaged loss and the gathered
    (ed_logits, es_logits) for metric computation."""

    def gather(logits, idx):
        return jax.lax.dynamic_index_in_dim(logits, idx, axis=1, keepdims=False)

    ed_logits = jax.vmap(gather)(seg_logits, ed_idx)  # (N, 2, H, W)
    es_logits = jax.vmap(gather)(seg_logits, es_idx)
    oh_ed = one_hot_channels(label_ed[:, None], 2)
    oh_es = one_hot_channels(label_es[:, None], 2)
    loss = (bce_with_logits(ed_logits, oh_ed) + bce_with_logits(es_logits, oh_es)) / 2.0
    return loss, (ed_logits, es_logits)


def clasfv_total_loss(video, seg_logits, motion, label_ed, label_es, ed_idx, es_idx):
    """The full CLAS-FV objective (train_test.py:33-88). Returns
    (total, aux dict)."""
    ota = deformation_motion_loss(video, motion)
    sgs, ots = motion_seg_loss(label_ed, label_es, ed_idx, es_idx, motion, seg_logits)
    edes, (ed_logits, es_logits) = edes_supervised_loss(
        seg_logits, label_ed, label_es, ed_idx, es_idx)
    total = ota + sgs + ots + edes
    aux = {
        "ota": ota, "sgs": sgs, "ots": ots, "edes_bce": edes,
        "ed_logits": ed_logits, "es_logits": es_logits,
    }
    return total, aux
