"""utils/concurrency.get_or_build: the once-guard shared by the engine's
compile/operand caches and ClipForward (advisor round-3: check-then-build
raced, duplicating XLA compiles on concurrent first calls)."""

import threading
import time
from collections import OrderedDict

import pytest

from echoflow.utils.concurrency import get_or_build


def test_concurrent_first_calls_share_one_build():
    cache, lock = {}, threading.Lock()
    builds = []
    started = threading.Barrier(4)

    def call(out, i):
        started.wait()
        out[i] = get_or_build(
            cache, lock, "k",
            lambda: (builds.append(1), time.sleep(0.05), "built")[-1])

    out = {}
    threads = [threading.Thread(target=call, args=(out, i)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1
    assert all(v == "built" for v in out.values())


def test_failed_build_evicts_and_reraises_then_retries():
    cache, lock = {}, threading.Lock()
    attempts = []

    def failing():
        attempts.append(1)
        raise ValueError("boom")

    with pytest.raises(ValueError):
        get_or_build(cache, lock, "k", failing)
    assert "k" not in cache  # evicted: the key can be retried
    assert get_or_build(cache, lock, "k", lambda: 7) == 7
    assert len(attempts) == 1


def test_waiter_sees_builders_exception():
    cache, lock = {}, threading.Lock()
    gate = threading.Event()
    errs = []

    def slow_fail():
        gate.wait(2)
        raise RuntimeError("build died")

    def builder():
        try:
            get_or_build(cache, lock, "k", slow_fail)
        except RuntimeError as e:
            errs.append(("builder", str(e)))

    def waiter():
        while "k" not in cache:  # wait until the Future is installed
            time.sleep(0.001)
        gate.set()
        try:
            get_or_build(cache, lock, "k", lambda: "never")
        except RuntimeError as e:
            errs.append(("waiter", str(e)))

    tb, tw = threading.Thread(target=builder), threading.Thread(target=waiter)
    tb.start(); tw.start(); tb.join(); tw.join()
    assert ("builder", "build died") in errs
    # The waiter either saw the builder's exception, or arrived after the
    # eviction and built fresh ("never" succeeded — no exception recorded).
    assert len(errs) in (1, 2)


def test_lru_cap_evicts_oldest_and_refreshes_hits():
    cache, lock = OrderedDict(), threading.Lock()
    for k in ("a", "b", "c"):
        get_or_build(cache, lock, k, lambda k=k: k.upper(), lru_cap=3)
    # Hit "a" so it becomes MRU, then insert "d": "b" is the LRU evicted.
    assert get_or_build(cache, lock, "a", lambda: "WRONG", lru_cap=3) == "A"
    get_or_build(cache, lock, "d", lambda: "D", lru_cap=3)
    assert set(cache) == {"c", "a", "d"}


def test_failed_build_does_not_evict_a_newer_builders_future():
    """After an LRU eviction re-opens a key, a stale builder's FAILURE must
    not pop the replacement builder's pending Future (that would re-open the
    duplicate-build race for every subsequent caller)."""
    cache, lock = OrderedDict(), threading.Lock()
    fail_gate, build_gate = threading.Event(), threading.Event()
    results = {}

    def failing():
        fail_gate.wait(2)
        raise ValueError("stale build died")

    def stale():
        try:
            get_or_build(cache, lock, "k", failing, lru_cap=1)
        except ValueError:
            results["stale"] = "raised"

    t_stale = threading.Thread(target=stale)
    t_stale.start()
    while "k" not in cache:
        time.sleep(0.001)
    # Evict the stale pending Future, then install a NEW builder for "k".
    get_or_build(cache, lock, "other", lambda: "o", lru_cap=1)

    def fresh():
        build_gate.wait(2)
        return "fresh-value"

    t_fresh = threading.Thread(
        target=lambda: results.update(
            fresh=get_or_build(cache, lock, "k", fresh, lru_cap=1)))
    t_fresh.start()
    while "k" not in cache:
        time.sleep(0.001)
    fresh_fut = cache["k"]
    fail_gate.set()  # stale build fails NOW, while fresh is still pending
    t_stale.join()
    assert cache.get("k") is fresh_fut  # stale failure didn't pop it
    build_gate.set()
    t_fresh.join()
    assert results == {"stale": "raised", "fresh": "fresh-value"}
    # A latecomer joins the fresh result instead of rebuilding.
    assert get_or_build(cache, lock, "k", lambda: "WRONG", lru_cap=1) == "fresh-value"


def test_evicted_pending_future_still_resolves_for_its_waiters():
    cache, lock = OrderedDict(), threading.Lock()
    release = threading.Event()
    results = {}

    def slow():
        release.wait(2)
        return "slow-value"

    def first():
        results["first"] = get_or_build(cache, lock, "k", slow, lru_cap=1)

    t = threading.Thread(target=first)
    t.start()
    while "k" not in cache:
        time.sleep(0.001)
    # Evict the pending Future by overflowing the cap from another key.
    get_or_build(cache, lock, "other", lambda: "o", lru_cap=1)
    assert "k" not in cache
    release.set()
    t.join()
    assert results["first"] == "slow-value"  # waiter kept its own reference
