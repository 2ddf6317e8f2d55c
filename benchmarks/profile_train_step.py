"""Component breakdown of the CLAS-FV train step.

Times, scan-chained in one dispatch each (the tunnel adds ~27 ms per
materialization, so every figure is amortized over CHAIN repetitions inside
a single jit — see bench._machine_matmul_tfs):

  full         - the complete train step with the reference-literal loss
                 schedule (fwd + OTA + SGS/OTS + BCE + bwd + Adam)
  full_fused   - the same step with the ADOPTED fused-OTA schedule
                 (make_train_step's default; OTA warps ride the SGS/OTS
                 scan — losses.clasfv_total_loss_fused)
  fwd_bwd      - model forward (train=True) + backward of a surrogate mean
                 loss on (seg, motion) only — the conv backbone cost
  loss_grad    - grad of the CLAS-FV loss w.r.t. fixed (seg, motion) inputs,
                 no model — the warp-chain cost (unfused / fused variants)
  ota_grad     - grad of OTA alone (batched 124-warp)
  sgsots_grad  - grad of SGS/OTS alone (the 31-step 4-wide masked scans)

Measured (v5e, batch 4, fp32, 2026-08 round 4; itemization round 5):
  full 344.7 ms ≈ model fwd+bwd 152.2 + loss grads 140.6 + 51.9 residual
  full_fused 279.1 ms (-19%): sharing the per-direction flow coordinates
  between OTA's video warps and the label chains removes most of OTA's
  standalone cost (ota_grad alone: 8.8 ms batched; in the full unfused
  graph its true cost was ~90 ms, dominated by scheduling, not FLOPs).
The round-4 "unexplained 52 ms" is now itemized: fwd_loss_bwd (the real
loss chained into the model backward in ONE graph, no optimizer, no
metrics) alone measures 344.0 ms — the residual is combined-graph
SERIALIZATION (serialization_ms 51.2: larger live activation set once the
loss-grad chain feeds the backward, vs the two parts measured as separate
graphs), not optimizer or metric cost (adam_ms 4.9; the scan DCEs the dice
metrics; residual_ms -4.2 ≈ timing noise). Remat (jax.checkpoint on the
model forward) does NOT reclaim it: full fused step 307.0 ms with remat vs
278.9 without (the recompute cost exceeds the memory-pressure saving), so
the fused no-remat schedule stays the default and the 250 ms target is
not reachable by scheduling alone — the serialization is intrinsic to
holding the forward's activations across the loss-grad chain.
Batch 8 → ~linear loss-grad scaling (compute-bound); Adam vs SGD <1 ms;
component deltas cross-checked by monkeypatch ablation in round 3.

Usage: python benchmarks/profile_train_step.py [--chain 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timed(fn, *args, repeats: int = 3):
    """Time one host materialization of fn(*args). NOT block_until_ready:
    on the tunneled backend it sometimes returns before the computation
    finishes (0.0 ms readings) — np.asarray forces the device->host copy
    and is the only reliable barrier here (see bench._machine_matmul_tfs)."""
    def materialize(out):
        import jax
        return [np.asarray(x) for x in jax.tree.leaves(out)]

    materialize(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        materialize(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default=None,
                    help="also write the results JSON to this path (the "
                         "committed artifact is "
                         "benchmarks/train_step_profile.json)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from echoflow.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import make_train_bench_fixture
    from echoflow.train.losses import (
        clasfv_total_loss,
        deformation_motion_loss,
        motion_seg_loss,
    )

    n = args.batch
    chain = args.chain
    # The SAME state/batch/chained-step recipe bench.py certifies — the
    # profiler must ablate exactly the step the artifact reports.
    fx = make_train_bench_fixture(batch_size=n)
    model, state, batch = fx.model, fx.state, fx.batch

    rng = np.random.RandomState(1)
    seg0 = jnp.asarray(rng.randn(n, 2, 32, 112, 112), jnp.float32)
    mot0 = jnp.asarray(np.tanh(rng.randn(n, 4, 32, 112, 112)) * 0.05, jnp.float32)

    results = {}

    def full(state, batch):
        # Explicit fused=False: the reference-literal schedule, regardless
        # of the fixture's (adopted-fused) default.
        return fx.chained_steps(state, batch, chain, fused=False)

    results["full_ms"] = _timed(full, state, batch) / chain * 1000

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd_bwd(variables, video):
        def body(carry, _):
            # The 1e-30 carry perturbation makes each iteration's input
            # data-dependent on the previous one so XLA cannot hoist the
            # (otherwise loop-invariant) grad out of the scan and report
            # an 8x-amortized fantasy number.
            vid = video + carry * 1e-30

            def surrogate(v):
                (seg, motion), _ = model.apply(v, vid, train=True,
                                               mutable=["batch_stats"])
                return jnp.mean(seg) + jnp.mean(motion)

            g = jax.grad(surrogate)(variables)
            # Consume EVERY gradient leaf: probing a single leaf lets XLA
            # dead-code-eliminate the rest of the backward pass and report
            # a ~5x fantasy (30 ms for a real ~155 ms fwd+bwd, measured).
            probe = sum(jnp.mean(x) for x in jax.tree.leaves(g["params"]))
            return carry + probe, carry
        return jax.lax.scan(body, 0.0, None, length=chain)[0]

    results["fwd_bwd_ms"] = _timed(fwd_bwd, variables, batch["video"]) / chain * 1000

    def loss_on(seg, motion):
        total, _ = clasfv_total_loss(
            batch["video"], seg, motion, batch["ed_label"], batch["es_label"],
            batch["ed_idx"], batch["es_idx"])
        return total

    def chain_grad(fn):
        @jax.jit
        def run(seg, motion):
            def body(carry, _):
                gs, gm = jax.grad(fn, argnums=(0, 1))(seg + carry, motion)
                return carry + jnp.mean(gs) + jnp.mean(gm), carry
            return jax.lax.scan(body, 0.0, None, length=chain)[0]
        return run

    results["loss_grad_ms"] = _timed(chain_grad(loss_on), seg0, mot0) / chain * 1000

    def ota_on(seg, motion):
        return deformation_motion_loss(batch["video"], motion) + 0.0 * jnp.mean(seg)

    results["ota_grad_ms"] = _timed(chain_grad(ota_on), seg0, mot0) / chain * 1000

    def sgsots_on(seg, motion):
        sgs, ots = motion_seg_loss(batch["ed_label"], batch["es_label"],
                                   batch["ed_idx"], batch["es_idx"], motion, seg)
        return sgs + ots

    results["sgsots_grad_ms"] = _timed(chain_grad(sgsots_on), seg0, mot0) / chain * 1000

    # Candidate schedules (round-3 verdict item 4). fused: OTA warps ride
    # the SGS/OTS scan, sharing per-direction flow coordinates
    # (losses.clasfv_total_loss_fused — equivalence pinned in
    # tests/test_losses.py). Also measured as a full chained step so the
    # winner can become make_train_step's default.
    from echoflow.train.losses import clasfv_total_loss_fused

    def loss_fused_on(seg, motion):
        total, _ = clasfv_total_loss_fused(
            batch["video"], seg, motion, batch["ed_label"], batch["es_label"],
            batch["ed_idx"], batch["es_idx"])
        return total

    results["loss_grad_fused_ms"] = _timed(
        chain_grad(loss_fused_on), seg0, mot0) / chain * 1000

    # ---- itemize the full-vs-parts residual (round-4 verdict item 6) ----
    # The decomposition above sums INDEPENDENT graphs; the residual
    # (full - fwd_bwd - loss_grad, 52 ms in round 4) could live in the
    # optimizer, the scan's state carry, or combined-graph scheduling.
    # Pin it down with two more chained measurements:
    #
    #   fwd_loss_bwd - fwd + the REAL (unfused) loss + bwd through the
    #                  model, fixed params, no optimizer, no state carry.
    #                  Captures the serialization cost of chaining the
    #                  loss-grad into the model backward.
    #   adam         - tx.update + apply_updates alone on fixed grads
    #                  (31.6M params), chained with a carry perturbation.
    from echoflow.train.loop import _loss_fn

    @jax.jit
    def fwd_loss_bwd(variables, batch):
        def body(carry, _):
            vid = batch["video"] + carry * 1e-30
            b = dict(batch, video=vid)

            def real_loss(params):
                total, _ = _loss_fn(params, variables["batch_stats"], model,
                                    b, False, False)
                return total

            g = jax.grad(real_loss)(variables["params"])
            probe = sum(jnp.mean(x) for x in jax.tree.leaves(g))
            return carry + probe, carry
        return jax.lax.scan(body, 0.0, None, length=chain)[0]

    results["fwd_loss_bwd_ms"] = _timed(
        fwd_loss_bwd, variables, batch) / chain * 1000

    grads0 = jax.jit(lambda v, b: jax.grad(
        lambda p: _loss_fn(p, v["batch_stats"], model, b, False, False)[0])(
            v["params"]))(variables, batch)

    import optax as _optax

    @jax.jit
    def adam_only(params, opt_state, grads):
        def body(carry, _):
            p, o = carry
            g = jax.tree.map(lambda x: x + jnp.float32(1e-30), grads)
            updates, o = fx.tx.update(g, o, p)
            p = _optax.apply_updates(p, updates)
            return (p, o), 0.0
        (p, o), _ = jax.lax.scan(body, (params, opt_state), None, length=chain)
        # Consume EVERY leaf: probing one lets XLA DCE the rest (the Adam
        # update is elementwise-independent across leaves).
        return sum(jnp.mean(x) for x in jax.tree.leaves(p))

    results["adam_ms"] = _timed(
        adam_only, state.params, state.opt_state, grads0) / chain * 1000

    def full_fused(state, batch):
        # SAME state/batch as full_ms — only the loss schedule differs, so
        # the comparison is apples-to-apples (and skips a duplicate
        # full-model init on this compile-bound 1-core host).
        return fx.chained_steps(state, batch, chain, fused=True)

    results["full_fused_ms"] = _timed(full_fused, state, batch) / chain * 1000

    results = {k: round(v, 1) for k, v in results.items()}
    results["unexplained_ms"] = round(
        results["full_ms"] - results["fwd_bwd_ms"] - results["loss_grad_ms"], 1)
    # The itemization of unexplained_ms: combined-graph serialization
    # (chaining the real loss grad into the model backward) + optimizer.
    results["serialization_ms"] = round(
        results["fwd_loss_bwd_ms"] - results["fwd_bwd_ms"]
        - results["loss_grad_ms"], 1)
    results["residual_ms"] = round(
        results["full_ms"] - results["fwd_loss_bwd_ms"] - results["adam_ms"], 1)
    results["config"] = {"batch": args.batch, "chain": args.chain,
                         "backend": jax.default_backend()}
    text = json.dumps(results, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
