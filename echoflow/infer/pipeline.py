"""Full-video multi-heartbeat segmentation with shift-ensemble label fusion.

Re-designs the reference inference path (src/fuse_utils.py:16-102) TPU-first.
The reference runs, per video: a Python loop over `num_clips` time-shifted
copies, each trilinear-resized to a multiple of 32 frames, sliced into
32-frame clips, each clip forwarded at batch 1, softmax re-interpolated back,
argmaxed, and finally a per-frame Python loop over ITK label fusion — ~3.2 s
per video on a GPU.

Here the whole pipeline after host video decode is ONE jitted graph:

  1. Every shift's "slice + trilinear tail-stretch to round(L_k/32)*32
     frames" is a linear map on the time axis, so it is materialized on the
     host as a (K, T', T) matrix stack (banker's rounding preserved,
     reference fuse_utils.py:22 `np.round(L/32)`) and applied as one einsum
     (MXU work, no gathers).
  2. All K shifts x C clips run through the network as one batched, chunked
     forward (lax.map over chunks bounds peak memory).
  3. Softmax re-interpolation to each shift's true length is the transposed
     matrix stack, again one einsum (softmax-space interpolation,
     reference fuse_utils.py:74-77), then argmax.
  4. Shift alignment becomes a static gather: rater k's opinion about
     original frame i is its local frame i - k*step
     (reference fuse_utils.py:84-98, including frame-i's exclusion of
     shifts with k >= i), encoded as host-built index/validity matrices.
  5. Per-frame SIMPLE/STAPLE/majority fusion is vmapped over frames
     (echoflow.ops.fusion), or the softmax-mean fast path fuses
     probabilities directly.

Video lengths are bucketed (padded to a multiple of 32): one compile per
(bucket, num_clips, forward-batch quantum, fuse_method) serves every video
in that bucket — the resize/gather matrices are runtime inputs. Only the
clips that actually exist reach the network (the bucket's padded tail is
dropped before the forward, which is where ~94% of the time goes), so a
144-frame video in the 192 bucket forwards 20 clips, not 30.
"""

from __future__ import annotations

import functools
import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from echoflow.models.r2plus1d import R2Plus1DMotionSegNet
from echoflow.ops.fusion import fuse_frames, softmax_mean_fuse
from echoflow.ops.normalize import zeroone_normalize
from echoflow.ops.resize import _linear_resize_matrix_np

CLIP_LEN = 32


def _packbits(mask: "jnp.ndarray") -> "jnp.ndarray":
    """Bit-pack a binary (T, H, W) uint8 mask along W (8 pixels/byte) to cut
    device->host traffic 8x; inverse is `_unpackbits`. No-op if W % 8 != 0."""
    t, h, w = mask.shape
    if w % 8 != 0:
        return mask
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    grouped = mask.reshape(t, h, w // 8, 8)
    return jnp.sum(grouped * weights, axis=-1, dtype=jnp.uint8)


def _unpackbits(packed: np.ndarray, width: int) -> np.ndarray:
    if packed.shape[-1] == width:
        return packed
    return np.unpackbits(packed, axis=-1)[..., :width]


def round_half_even(x: float) -> int:
    """np.round semantics (banker's rounding) — load-bearing for clip counts
    (reference fuse_utils.py:22,29)."""
    return int(np.round(x))


def divide_to_consecutive_clips(video: np.ndarray, clip_length: int = CLIP_LEN,
                                interpolate_last: bool = False) -> np.ndarray:
    """Reference-parity host helper: (3, L, H, W) -> (N, 3, clip_length, H, W).

    With interpolate_last, the whole video is trilinear-stretched
    (align_corners=False) to round(L/clip)*clip frames first
    (reference fuse_utils.py:16-33).
    """
    from echoflow.ops.resize import resize_linear

    length = video.shape[1]
    target = round_half_even(length / clip_length) * clip_length
    src = video
    if length % clip_length != 0 and interpolate_last:
        src = np.asarray(resize_linear(jnp.asarray(video), 1, target, align_corners=False))
    clips = [src[:, s: s + clip_length] for s in range(0, target, clip_length)
             if s + clip_length <= src.shape[1]]
    return np.stack(clips) if clips else np.empty((0, 3, clip_length, *video.shape[2:]))


def _shift_plan(length: int, num_clips: int, step: int):
    """Per-shift (shift_offset, L_k, L_k') with the reference's shift-count
    clamp (fuse_utils.py:38-48), hardened at the lower edge: for
    32 <= L < 32 + step the reference computes num_clips = 0 and crashes
    downstream (it clamps only < 0 to 1, fuse_utils.py:41); echoflow clamps
    < 1 to 1 and segments the single available shift instead."""
    if length < CLIP_LEN + num_clips * step:
        num_clips = (length - CLIP_LEN) // step
    if num_clips < 1:
        num_clips = 1
    plan = []
    for k in range(num_clips):
        off = k * step
        lk = length - off
        lk_interp = max(CLIP_LEN, round_half_even(lk / CLIP_LEN) * CLIP_LEN)
        plan.append((off, lk, lk_interp))
    return plan


def _build_host_operands(length: int, num_clips: int, step: int, t_pad: int):
    """All data-dependent-but-host-computable pieces: the forward and
    backward time-resize matrix stacks, the shift-alignment gather indices,
    and validity masks. Shapes are static in (t_pad, K, C)."""
    plan = _shift_plan(length, num_clips, step)
    k_num = len(plan)
    c_max = t_pad // CLIP_LEN

    fwd = np.zeros((k_num, t_pad, t_pad), np.float32)   # (K, T', T)
    bwd = np.zeros((k_num, t_pad, t_pad), np.float32)   # (K, T, T')
    clip_valid = np.zeros((k_num, c_max), np.float32)
    frame_valid_per_shift = np.zeros((k_num, t_pad), np.float32)

    for k, (off, lk, lki) in enumerate(plan):
        m = _linear_resize_matrix_np(lk, lki, False)     # (L_k', L_k)
        fwd[k, :lki, off:off + lk] = m
        if lki != lk:
            back = _linear_resize_matrix_np(lki, lk, False)  # (L_k, L_k')
        else:
            back = np.eye(lk, dtype=np.float32)
        bwd[k, :lk, :lki] = back
        clip_valid[k, : lki // CLIP_LEN] = 1.0
        frame_valid_per_shift[k, :lk] = 1.0

    # Shift-aligned gather: rater k for original frame i is local frame
    # i - off_k. Validity per reference fuse_utils.py:82-98: frame 0 ->
    # shift 0 only; frame i >= 1 -> shifts k < min(i, K) with i - off_k >= 0.
    gather_idx = np.zeros((t_pad, k_num), np.int64)
    valid = np.zeros((t_pad, k_num), np.float32)
    for i in range(length):
        for k, (off, lk, _) in enumerate(plan):
            local = i - off
            if i == 0:
                ok = k == 0
            else:
                ok = (k < min(i, k_num)) and local >= 0
            if ok and 0 <= local < lk:
                gather_idx[i, k] = local
                valid[i, k] = 1.0
    # Frames the fusion can't source from any shift fall back to shift 0
    # (only possible for 1 <= i < step; the reference misaligns there).
    for i in range(length):
        if valid[i].sum() == 0:
            gather_idx[i, 0] = i
            valid[i, 0] = 1.0

    # Flat indices (into the k-major (K * c_max) clip grid) of the clips
    # that actually exist: shift k contributes its first lki/32 slots. Only
    # these reach the network — the padded tail slots' outputs would meet
    # all-zero `bwd` columns anyway (bwd[k] is nonzero only in its first
    # lki columns), so dropping them from the forward is bit-exact.
    valid_clip_idx = np.flatnonzero(clip_valid.reshape(-1)).astype(np.int32)

    return dict(fwd=fwd, bwd=bwd, clip_valid=clip_valid, gather_idx=gather_idx,
                valid=valid, k_num=k_num, c_max=c_max,
                valid_clip_idx=valid_clip_idx)


@dataclass
class VideoSegmenter:
    """Batched full-video segmentation engine.

    Parameters
    ----------
    variables : flax variables for R2Plus1DMotionSegNet
    dtype : compute dtype policy. The default "auto" resolves to bfloat16 on
        an accelerator and float32 on CPU: the measured bf16 ED/ES
        ground-truth Dice delta vs fp32 is 0.0003 — inside the ±0.001
        accuracy bar (benchmarks/precision_study.json) — for ~20% more
        stream throughput, and bf16 is the native TPU inference dtype.
        Pass jnp.float32 explicitly for the bit-exact parity path (identical
        masks to the flax fp32 forward), jnp.bfloat16 to force the fast
        path everywhere.
    forward_chunk : clips per forward chunk (bounds peak activation memory);
        with a mesh this is the *per-device* chunk. Default 30 = one chunk
        for a 176-frame 5-shift video (~1 GB peak stem activation in bf16):
        a v5e sweep measured 15/30/60-clip chunks at 1868/1939/1735 f/s
        medians on the headline stream — 30 wins; drop it on small devices
    bucket : videos are padded to a multiple of this many frames; one
        compile serves a whole bucket
    mesh : optional `jax.sharding.Mesh` with a `data` axis. Shards the
        K-shifts x C-clips batch (and the fusion frame axis) over devices —
        the TPU-native replacement for the reference's DataParallel scatter
        at inference (reference motion_segment.py:69; SURVEY.md §2.4).
        Weights are replicated across the mesh once at construction.
    """

    variables: dict
    dtype: object = "auto"
    backbone_dtype: object = None  # None = same as dtype; bf16 = mixed policy
    forward_chunk: int = 30
    bucket: int = 64
    fold_bn: bool = True
    mesh: object = None
    decoder: str = "xla"  # "xla" | "pallas" | "model" (see __post_init__)
    operand_cache_size: int = 64  # LRU cap on per-length device operands

    def __post_init__(self):
        if self.decoder not in ("xla", "pallas", "model"):
            raise ValueError(
                f"decoder must be 'xla', 'pallas', or 'model'; got {self.decoder!r}")
        if self.dtype == "auto":
            # Same platform convention as ops/warp._resolve_backend.
            self.dtype = (jnp.float32 if jax.default_backend() == "cpu"
                          else jnp.bfloat16)
        if self.fold_bn:
            # Inference-only engine: absorb every BatchNorm into its conv
            # (exact; see models/fold_bn.py). Variables without batch_stats
            # are taken as already folded.
            if "batch_stats" in self.variables:
                from echoflow.models.fold_bn import fold_variables

                self.variables = fold_variables(self.variables)
            self._model = R2Plus1DMotionSegNet(dtype=self.dtype, folded=True)
            self._folded = True
        else:
            self._model = R2Plus1DMotionSegNet(dtype=self.dtype)
            self._folded = False
        # Decoder backend for the folded forward: "xla" runs the decoder
        # as einsums with the unused motion head dead-code-eliminated
        # (bit-identical to the flax module, ~4% faster); "pallas" is the
        # experimental fused decoder kernel (ops/pallas/decoder_kernel.py
        # — single-device TPU only); "model" forces the plain flax apply.
        if not self._folded or (self.decoder == "pallas" and self.mesh is not None):
            self.decoder = "model"
        # Pin the weights on device once — passing host arrays into the
        # jitted graph would re-transfer ~126 MB per call. With a mesh,
        # replicate them across every device up front.
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())
            self.variables = jax.device_put(
                jax.tree.map(jnp.asarray, self.variables), rep)
        else:
            self.variables = jax.tree.map(jnp.asarray, self.variables)
        from collections import OrderedDict

        self._compiled = {}
        self._operand_cache = OrderedDict()
        # segment_videos stages/dispatches on a worker thread; direct
        # segment_video calls may race it on these caches.
        self._cache_lock = threading.Lock()

    # ---------------------------------------------------------------- graph
    def _chunk_plan(self, n_fwd: int):
        """Balanced forward chunking for `n_fwd` clips: n_chunks is the
        fewest chunks of <= forward_chunk (per device), and the chunk size
        is the *balanced* ceil(n_fwd / n_chunks) — NOT forward_chunk — so
        the padding waste is < n_chunks clips instead of up to a whole
        chunk (40 valid clips at forward_chunk=30 forward 2x20, not 2x30).
        With a mesh the chunk rounds up to a device-count multiple so the
        `data`-axis shard is even. Returns (n_chunks, chunk, total)."""
        n_dev = self.mesh.shape["data"] if self.mesh is not None else 1
        per_step = max(1, self.forward_chunk) * n_dev
        n_chunks = max(1, -(-n_fwd // per_step))
        chunk = -(-n_fwd // n_chunks)
        chunk = -(-chunk // n_dev) * n_dev
        return n_chunks, chunk, n_chunks * chunk

    def _graph(self, t_pad: int, k_num: int, n_fwd: int, fuse_method: str,
               mono: bool):
        """Per-key once-guard (utils/concurrency.get_or_build): the first
        caller for a (t_pad, k_num, n_fwd, fuse, mono) key builds; a
        concurrent second caller blocks on its Future instead of running a
        duplicate XLA trace/compile (expensive on this 1-core host)."""
        from echoflow.utils.concurrency import get_or_build

        key = (t_pad, k_num, n_fwd, fuse_method, mono)
        return get_or_build(
            self._compiled, self._cache_lock, key,
            lambda: self._build_graph(t_pad, k_num, n_fwd, fuse_method, mono))

    def _build_graph(self, t_pad: int, k_num: int, n_fwd: int,
                     fuse_method: str, mono: bool = False):
        c_max = t_pad // CLIP_LEN
        n_clips = k_num * c_max
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            clip_shard = NamedSharding(mesh, P(None, "data"))
            frame_shard = NamedSharding(mesh, P("data"))
        else:
            clip_shard = frame_shard = None
        n_chunks, chunk, total = self._chunk_plan(n_fwd)
        model = self._model

        @jax.jit
        def run(variables, video, fwd, bwd, gather_idx, valid,
                clip_src, clip_inv):
            # video (3, T, H, W) — or (1, T, H, W) when `mono` (the host
            # detected identical RGB channels, the normal case for echo
            # AVIs: 3x less tunnel upload and a 3x cheaper shift einsum;
            # per-channel normalization of identical channels is identical,
            # so broadcasting back to RGB below is bit-exact). Ships as
            # uint8 from the host (4x less PCIe/tunnel traffic) and is
            # normalized on device — zeroone is idempotent, so
            # pre-normalized floats are unchanged. Padding replicates the
            # last frame, so the per-channel min/max are unaffected.
            video = zeroone_normalize(video.astype(jnp.float32))
            h, w = video.shape[2], video.shape[3]
            # 1. shift + tail-stretch, all shifts at once (K, C, T', H, W)
            shifted = jnp.einsum("kst,cthw->kcshw", fwd, video,
                                 precision="highest")
            if mono:
                # Replicate to RGB only now, after the C-proportional work
                # (XLA fuses the broadcast into the consumer's reads).
                shifted = jnp.broadcast_to(
                    shifted, (k_num, 3, *shifted.shape[2:]))
            # 2. slice to clips: (K, C, 3, 32, H, W) -> (K*C, 3, 32, H, W),
            # then keep only the clips that exist (clip_src gathers the
            # valid slots; padding entries re-point at clip 0, whose junk
            # output is dropped by clip_inv below). Shifts whose true
            # length rounds below c_max clips stop paying for the bucket's
            # padded tail — the forward batch shrinks from K*c_max to
            # ~sum_k(L_k'/32) clips.
            clips = shifted.reshape(k_num, 3, c_max, CLIP_LEN, h, w)
            clips = jnp.moveaxis(clips, 1, 2).reshape(n_clips, 3, CLIP_LEN, h, w)
            clips = jnp.take(clips, clip_src, axis=0)  # (total, 3, 32, H, W)

            decoder = self.decoder

            def fwd_chunk(xs):
                if decoder == "model":
                    seg, _ = model.apply(variables, xs, train=False)
                else:
                    from echoflow.models.fast_forward import folded_forward

                    seg, _ = folded_forward(
                        variables, xs, dtype=self.dtype,
                        backbone_dtype=self.backbone_dtype,
                        pallas=(decoder == "pallas"), with_motion=False)
                return jax.nn.softmax(seg, axis=1)

            xs_all = clips.reshape(n_chunks, chunk, 3, CLIP_LEN, h, w)
            if clip_shard is not None:
                # DP inference: each chunk's clip axis is sharded over the
                # mesh's `data` axis; every device forwards its shard.
                xs_all = jax.lax.with_sharding_constraint(xs_all, clip_shard)
            probs = jax.lax.map(fwd_chunk, xs_all)
            # Restore the full k-major (K * c_max) clip grid: clip_inv maps
            # each grid slot to its forwarded position, out-of-bounds for
            # slots that were never forwarded -> exact zeros (bit-identical
            # to the old always-forward layout, whose tail slots met
            # all-zero bwd columns: 0 * finite == 0 * 0 == +0.0).
            probs = probs.reshape(-1, 2, CLIP_LEN, h, w)
            probs = jnp.take(probs, clip_inv, axis=0, mode="fill",
                             fill_value=0)

            # 3. reassemble (K, 2, T', H, W); re-interp to true lengths.
            probs = probs.reshape(k_num, c_max, 2, CLIP_LEN, h, w)
            probs = jnp.moveaxis(probs, 2, 1).reshape(k_num, 2, c_max * CLIP_LEN, h, w)
            interp = jnp.einsum("kts,kcshw->kcthw", bwd, probs,
                                precision="highest")  # (K, 2, T, H, W)

            # 4. shift-aligned rater stack (T, K, ...)
            if fuse_method == "softmax":
                # fast path: gather probabilities, masked mean, argmax
                per_shift = jnp.moveaxis(interp, 2, 0)          # (T, K, 2, H, W)
                stack = jnp.take_along_axis(
                    per_shift, gather_idx[:, :, None, None, None], axis=0)
                if frame_shard is not None:
                    stack = jax.lax.with_sharding_constraint(stack, frame_shard)
                fused = jax.vmap(softmax_mean_fuse)(stack, valid)
                return _packbits(fused)

            labels = jnp.argmax(interp, axis=1).astype(jnp.uint8)  # (K, T, H, W)
            per_shift = jnp.moveaxis(labels, 1, 0)                  # (T, K, H, W)
            stack = jnp.take_along_axis(
                per_shift, gather_idx[:, :, None, None], axis=0)
            if frame_shard is not None:
                # Per-frame fusion shards over the video's frame axis.
                stack = jax.lax.with_sharding_constraint(stack, frame_shard)
            fused = fuse_frames(stack, valid, method=fuse_method)
            return _packbits(fused)

        return run

    # ----------------------------------------------------------------- api
    def segment_video_async(self, video: np.ndarray, num_clips: int = 1,
                            step: int = 1, fuse_method: str = "simple",
                            mono: bool | None = None):
        """Dispatch segmentation without blocking; returns (device_array,
        length). jax dispatch is asynchronous, so queuing several videos
        overlaps each one's host->device transfer with the previous one's
        compute. Call `np.asarray(result)[:length]` to materialize.

        `mono=None` (default) auto-detects grayscale-in-RGB videos (all
        three channels bit-identical — the normal case for echo AVIs;
        EchoNet's six "blue" videos are the exception) and ships a single
        channel, replicated on device: 3x less host->device tunnel traffic
        for bit-identical output. Pass False to force the RGB path (the
        ~1 ms/video equality check is skipped for known-color streams)."""
        length = int(video.shape[1])
        t_pad = max(self.bucket, -(-length // self.bucket) * self.bucket)

        # Device-resident operand cache: videos of the same length reuse the
        # same resize/gather/validity tensors with zero re-transfer. LRU —
        # a production stream of many distinct lengths would otherwise pin
        # a few MB of HBM per length forever.
        okey = (length, num_clips, step, t_pad)
        # Same once-guard as _graph (utils/concurrency.get_or_build):
        # concurrent first calls for one length share one host-operand
        # build + device transfer instead of duplicating it.
        from echoflow.utils.concurrency import get_or_build

        def _build_operands():
            ops = _build_host_operands(length, num_clips, step, t_pad)
            vidx = ops["valid_clip_idx"]
            n_valid = len(vidx)
            # Static forward-batch size: n_valid rounded up to a multiple
            # of 4 (bounds the compile count to ~3 variants per bucket
            # instead of one per distinct length), capped at the full grid.
            n_fwd = min(-(-n_valid // 4) * 4, ops["k_num"] * ops["c_max"])
            _, _, total = self._chunk_plan(n_fwd)
            # Forward-gather indices: valid slots, then clip 0 as padding.
            clip_src = np.zeros(total, np.int32)
            clip_src[:n_valid] = vidx
            # Inverse map grid-slot -> forwarded position; slots that were
            # never forwarded point out of bounds (mode="fill" -> zeros).
            clip_inv = np.full(ops["k_num"] * ops["c_max"], total, np.int32)
            clip_inv[vidx] = np.arange(n_valid, dtype=np.int32)
            dev_ops = tuple(
                jnp.asarray(a) for a in
                (ops["fwd"], ops["bwd"], ops["gather_idx"], ops["valid"],
                 clip_src, clip_inv))
            return ops["k_num"], n_fwd, dev_ops

        k_num, n_fwd, dev_ops = get_or_build(
            self._operand_cache, self._cache_lock, okey, _build_operands,
            lru_cap=self.operand_cache_size)

        video = np.asarray(video)
        if video.shape[0] == 1:
            # Already single-channel: only the mono graph can run it (the
            # RGB graph's clip reshape assumes C=3), whatever was passed.
            mono = True
        elif mono is None:
            mono = (video.shape[0] == 3
                    and np.array_equal(video[0], video[1])
                    and np.array_equal(video[1], video[2]))
        dtype = np.uint8 if video.dtype == np.uint8 else np.float32
        src = video[:1] if mono else video
        vid = np.empty((src.shape[0], t_pad, *video.shape[2:]), dtype)
        vid[:, :length] = src
        vid[:, length:] = src[:, -1:]  # replicate-pad: keeps min/max honest

        run = self._graph(t_pad, k_num, n_fwd, fuse_method, mono)
        fused = run(self.variables, jnp.asarray(vid), *dev_ops)
        return fused, (length, int(video.shape[3]))

    def segment_video(self, video: np.ndarray, num_clips: int = 1, step: int = 1,
                      fuse_method: str = "simple") -> np.ndarray:
        """video: (3, L, 112, 112) — uint8 raw intensities (preferred; 4x
        less host->device traffic) or float already in [0, 1]; per-channel
        zeroone normalization happens on device either way. Returns
        (L, 112, 112) uint8 labels. Matches the reference
        `segment_a_video_with_fusion` contract (fuse_utils.py:36-102)."""
        fused, (length, width) = self.segment_video_async(video, num_clips, step, fuse_method)
        return _unpackbits(np.asarray(jax.device_get(fused)), width)[:length]

    def segment_videos(self, videos, num_clips: int = 1, step: int = 1,
                       fuse_method: str = "simple", queue_depth: int = 3):
        """Segment a sequence of videos with dispatch-ahead pipelining:
        up to `queue_depth` videos are in flight, and results are fetched on
        background threads so device->host round-trip latency overlaps both
        the dispatches and the caller's per-video work. Yields (L, H, W)
        uint8 masks in order.

        Staging + dispatch run on a dedicated single worker thread (FIFO, so
        dispatch order is preserved): the host->device video transfer blocks
        its calling thread for ~6 ms/video through the tunnel, and on this
        one-core host the caller's per-video work (e.g. EF extraction)
        would otherwise serialize with it and starve the device."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def fetch(handle_future):
            fused, (length, width) = handle_future.result()
            return _unpackbits(np.asarray(jax.device_get(fused)), width)[:length]

        with ThreadPoolExecutor(max_workers=1) as dispatch_pool, \
                ThreadPoolExecutor(max_workers=2) as fetch_pool:
            inflight: deque = deque()
            for video in videos:
                handle = dispatch_pool.submit(
                    self.segment_video_async, video, num_clips, step, fuse_method)
                inflight.append(fetch_pool.submit(fetch, handle))
                if len(inflight) >= queue_depth:
                    yield inflight.popleft().result()
            while inflight:
                yield inflight.popleft().result()


_SHIM_ENGINES: list = []  # [(variables, leaf_ids, VideoSegmenter)] MRU
_SHIM_ENGINES_LOCK = threading.Lock()
_SHIM_MAX = 4


def _leaf_ids(variables) -> tuple:
    import jax

    return tuple(map(id, jax.tree.leaves(variables)))


def _segmenter_for_variables(variables) -> VideoSegmenter:
    """A fp32 (reference-parity) engine for a raw flax `variables` dict,
    built once per dict and reused across calls — a fresh engine per call
    would re-trace/re-compile every video. Keyed on the dict's identity AND
    its leaf-array identities: the engine folds/pins a *copy* of the
    weights at construction, so loading a new checkpoint into the same tree
    (which replaces the leaf objects — jax arrays are immutable) must
    rebuild instead of serving the old weights. (Writing into numpy leaf
    buffers in place is the one undetectable mutation.) The small MRU holds
    a strong reference to each variables dict so ids cannot be recycled
    while an entry lives."""
    ids = _leaf_ids(variables)
    with _SHIM_ENGINES_LOCK:
        for i, (v, lids, s) in enumerate(_SHIM_ENGINES):
            if v is variables and lids == ids:
                _SHIM_ENGINES.append(_SHIM_ENGINES.pop(i))
                return s
        # Drop any stale entry for this dict (leaves were swapped).
        _SHIM_ENGINES[:] = [e for e in _SHIM_ENGINES if e[0] is not variables]
        seg = VideoSegmenter(variables=variables, dtype=jnp.float32)
        _SHIM_ENGINES.append((variables, ids, seg))
        del _SHIM_ENGINES[:-_SHIM_MAX]
        return seg


def segment_a_video_with_fusion(video, segmenter,
                                interpolate_last: bool = True, step: int = 1,
                                num_clips: int = 10, fuse_method: str = "simple",
                                class_list=(0, 1)) -> np.ndarray:
    """Reference-named alias (fuse_utils.py:36). `segmenter` is a
    `VideoSegmenter`, or flax `variables` for R2Plus1DMotionSegNet (the
    slot the reference fills with its torch model) — variables are wrapped
    in a cached fp32 parity engine. `interpolate_last` and `class_list`
    exist for signature parity; the engine always tail-interpolates (the
    reference EF pipeline always passes True) and the EchoNet task is
    binary."""
    del interpolate_last, class_list
    if not isinstance(segmenter, VideoSegmenter):
        segmenter = _segmenter_for_variables(segmenter)
    return segmenter.segment_video(np.asarray(video), num_clips=num_clips,
                                   step=step, fuse_method=fuse_method)
