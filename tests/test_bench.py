"""Unit tests for bench.py's outage-resilient parent orchestration.

The parent loop (bench.py:_parent_main) is what turns a transient TPU-tunnel
outage into a retried capture instead of a lost round artifact (round-3
verdict item 1: BENCH_r03 was a single-shot loss). These tests drive it with
a fake clock and fake probe/child so the retry, best-partial, and deadline
semantics are pinned without any device or subprocess.
"""

import json

import pytest

import bench


class _FakeTime:
    """Deterministic clock: time() returns the current fake second, sleep()
    advances it. perf_counter mirrors time for completeness."""

    def __init__(self):
        self.now = 1000.0

    def time(self):
        return self.now

    def sleep(self, sec):
        self.now += max(float(sec), 1.0)  # a zero-sleep still makes progress

    def perf_counter(self):
        return self.now


@pytest.fixture()
def fake_time(monkeypatch):
    ft = _FakeTime()
    monkeypatch.setattr(bench, "time", ft)
    return ft


def _args(**over):
    import types

    defaults = dict(train=False, no_train=True, deadline=2280.0,
                    attempt_budget=1100.0, child=False)
    defaults.update(over)
    return types.SimpleNamespace(**defaults)


COMPLETE = {"metric": "m", "value": 1200.0, "unit": "frames/sec",
            "vs_baseline": 22.2}


def test_extract_json_line_takes_last_parseable_object():
    out = "\n".join([
        "WARNING: Platform 'axon' is experimental",
        '{"value": 1}',
        "{not json}",
        'chatter prefix {"value": 2}',  # does not start with "{": skipped
        '{"value": 3, "unit": "frames/sec"}',
        "bye",
    ])
    assert bench._extract_json_line(out) == {"value": 3, "unit": "frames/sec"}


def test_extract_json_line_none_when_no_json():
    assert bench._extract_json_line("no json here\nat all\n") is None


def test_more_complete_prefers_non_null_value_then_field_count():
    a = {"value": None, "partial": True, "x": 1, "y": 2}
    b = {"value": 900.0, "partial": True}
    assert bench._more_complete(a, b) is b
    assert bench._more_complete(b, a) is b
    c = {"value": 900.0, "partial": True, "train_step_ms": 300.0}
    assert bench._more_complete(b, c) is c
    assert bench._more_complete(None, a) is a
    assert bench._more_complete(a, None) is a


def test_parent_retries_past_partial_then_prints_complete(
        fake_time, monkeypatch, capsys):
    calls = {"probe": 0, "child": 0}
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda timeout_sec: calls.__setitem__(
                            "probe", calls["probe"] + 1) or True)

    def fake_child(args, budget, wait_sec=None):
        calls["child"] += 1
        fake_time.sleep(120)  # a child attempt costs wall time
        if calls["child"] == 1:
            return {"value": None, "partial": True,
                    "partial_reason": "crashed: UNAVAILABLE"}, "crashed"
        return dict(COMPLETE), ""

    monkeypatch.setattr(bench, "_run_child", fake_child)
    rc = bench._parent_main(_args())
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert calls["child"] == 2
    assert json.loads(out[-1]) == COMPLETE


def test_parent_emits_no_attempt_partial_when_backend_never_up(
        fake_time, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_backend", lambda timeout_sec: False)
    monkeypatch.setattr(
        bench, "_run_child",
        lambda args, budget, wait_sec=None: pytest.fail(
            "child must not run when probe fails"))
    rc = bench._parent_main(_args(deadline=400.0))
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert line["partial"] is True
    assert line["value"] is None
    assert "backend unavailable" in line["partial_reason"]


def test_parent_keeps_most_complete_partial_across_attempts(
        fake_time, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_backend", lambda timeout_sec: True)
    partials = [
        ({"value": None, "partial": True, "partial_reason": "wedge",
          "machine_matmul_tfs_before": 68.0}, "wedge"),
        ({"value": 850.0, "unit": "frames/sec", "partial": True,
          "partial_reason": "watchdog", "all_passes": [850.0]}, "watchdog"),
        ({"value": None, "partial": True, "partial_reason": "crashed"},
         "crashed"),
    ]
    it = iter(partials)

    def fake_child(args, budget, wait_sec=None):
        fake_time.sleep(600)
        try:
            return next(it)
        except StopIteration:
            return {"value": None, "partial": True,
                    "partial_reason": "crashed"}, "crashed"

    monkeypatch.setattr(bench, "_run_child", fake_child)
    rc = bench._parent_main(_args(deadline=2280.0))
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert line["value"] == 850.0  # the non-null-value partial won
    assert line["partial"] is True


def test_parent_respects_deadline_headroom(fake_time, monkeypatch, capsys):
    """The attempt budget must leave the parent room to emit: no child call
    may be given a budget that runs past the deadline — even when the probe
    itself eats wall time (a slow-but-successful probe must not let a stale
    `remaining` size the child budget)."""

    def slow_probe(timeout_sec):
        fake_time.sleep(170)  # near the 180 s probe timeout, but successful
        return True

    monkeypatch.setattr(bench, "_probe_backend", slow_probe)
    budgets = []

    def fake_child(args, budget, wait_sec=None):
        budgets.append((bench.time.time(), budget, wait_sec))
        fake_time.sleep(budget)
        return {"value": None, "partial": True, "partial_reason": "x"}, "x"

    monkeypatch.setattr(bench, "_run_child", fake_child)
    t0 = fake_time.now
    deadline = 2280.0
    bench._parent_main(_args(deadline=deadline))
    assert budgets, "expected at least one attempt"
    for start, budget, wait in budgets:
        assert start + budget <= t0 + deadline, (
            "child budget overruns the parent deadline")
        # The parent's own hard wait on a wedged child (plus the 15 s
        # kill-grace in _run_bounded) must also land before the deadline.
        assert wait is not None and start + wait + 15 <= t0 + deadline, (
            "parent wait on a wedged child overruns the deadline")


def test_run_child_salvages_partial_json_on_timeout(monkeypatch):
    """A wedge that outlives the kill timeout (rc=None: child abandoned)
    must still salvage the partial JSON the child watchdog printed before
    wedging, rather than drop the capture (round-3 loss mode)."""
    salvaged = ("chatter\n"
                '{"value": 777.0, "partial": true, '
                '"partial_reason": "watchdog"}\n')
    monkeypatch.setattr(bench, "_run_bounded",
                        lambda cmd, timeout_sec, stderr=None: (None, salvaged))
    line, reason = bench._run_child(_args(), budget_sec=600.0)
    assert line is not None and line["value"] == 777.0
    assert reason == "watchdog"


def test_run_child_reports_timeout_when_no_output(monkeypatch):
    monkeypatch.setattr(bench, "_run_bounded",
                        lambda cmd, timeout_sec, stderr=None: (None, ""))
    line, reason = bench._run_child(_args(), budget_sec=600.0)
    assert line is None
    assert "timeout" in reason


def test_run_bounded_kills_hung_child_and_keeps_output():
    """Real-subprocess check: a child that prints then hangs is killed at
    the timeout, the parent does NOT block past it, and the already-printed
    stdout is returned (file-backed stdout, never a pipe)."""
    import sys
    import time as real_time

    t0 = real_time.monotonic()
    # 10 s timeout: interpreter startup alone can take seconds on this
    # 1-core host when another compile is hogging it — a 2 s bound once
    # killed the child before its print landed (flaky salvage assert).
    rc, text = bench._run_bounded(
        [sys.executable, "-u", "-c",
         'print(\'{"value": 5}\'); import time; time.sleep(600)'],
        timeout_sec=10.0)
    assert real_time.monotonic() - t0 < 60
    assert rc != 0  # killed (or, if truly unkillable, abandoned with None)
    assert bench._extract_json_line(text) == {"value": 5}


def test_run_bounded_abandons_unkillable_child(monkeypatch):
    """A child in uninterruptible device I/O survives SIGKILL until the
    wedge clears; the parent must abandon it (rc=None) after the grace
    wait instead of blocking — the communicate()-with-no-timeout hang was
    exactly the mode that could lose a round past the driver's window."""
    import subprocess

    class _WedgedProc:
        def __init__(self, cmd, stdout=None, stderr=None):
            stdout.write('{"value": null, "partial": true}\n')

        def wait(self, timeout=None):
            raise subprocess.TimeoutExpired("cmd", timeout)

        def kill(self):
            pass

    monkeypatch.setattr(subprocess, "Popen", _WedgedProc)
    rc, text = bench._run_bounded(["whatever"], timeout_sec=0.01)
    assert rc is None
    assert bench._extract_json_line(text) == {"value": None, "partial": True}


def test_crash_payloads_carry_train_metric(monkeypatch, capsys, fake_time):
    """--train runs must label crash/no-attempt partials with the train
    metric/unit, not the inference ones, or the driver files the artifact
    under the wrong metric."""
    fields = bench._metric_fields(True)
    assert fields["unit"] == "ms/step" and "train step" in fields["metric"]

    # Parent no-attempt fallback in --train mode.
    monkeypatch.setattr(bench, "_probe_backend", lambda timeout_sec: False)
    rc = bench._parent_main(_args(train=True, deadline=400.0))
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert line["unit"] == "ms/step"
    assert "train step" in line["metric"]

    # Child crash payload in --train mode.
    def boom(args):
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(bench, "main", boom)
    with pytest.raises(SystemExit):
        bench._child_main(_args(train=True))
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["unit"] == "ms/step"
    assert "train step" in line["metric"]
    assert line["partial"] is True


@pytest.mark.slow
def test_train_bench_fixture_runs_both_schedules_from_one_state():
    """make_train_bench_fixture's chained_steps must run the unfused AND
    fused loss schedules from the SAME state/batch (the profiler compares
    them apples-to-apples without re-initing a second fixture), producing
    close per-step losses (identical math up to fp summation order)."""
    import numpy as np

    fx = bench.make_train_bench_fixture(batch_size=1)
    unfused = np.asarray(fx.chained_steps(fx.state, fx.batch, 1))
    fused = np.asarray(fx.chained_steps(fx.state, fx.batch, 1, fused=True))
    assert unfused.shape == fused.shape == (1,)
    np.testing.assert_allclose(unfused, fused, rtol=2e-4)
