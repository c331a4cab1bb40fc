"""Completion-order batch collection (engine._ready_iter).

A wedged device transfer must not serialize the collects of batches
that already finished; the iterator yields ready handles first and only
falls back to launch order after `patience` with nothing ready.
"""
import time

import numpy as np

from isocon_tpu.ops.engine import PairEngine


class _Buf:
    def __init__(self, ready_at):
        self.ready_at = ready_at
        self.polls = 0

    def is_ready(self):
        self.polls += 1
        return time.perf_counter() >= self.ready_at


def _probe(item):
    return item[1][2]


def test_stalled_first_handle_does_not_delay_ready_ones():
    t0 = time.perf_counter()
    stalled = _Buf(t0 + 30.0)  # never ready within the test
    launched = [
        ("a", (None, None, stalled)),
        ("b", (None, None, _Buf(t0))),
        ("c", (None, None, _Buf(t0))),
    ]
    start = time.perf_counter()
    order = [c for c, _h in PairEngine._ready_iter(
        launched, _probe, patience=5.0, poll=0.01)]
    elapsed = time.perf_counter() - start
    # ready handles come first; the stalled one is yielded last via the
    # single-remaining shortcut (its blocking collect is then the only
    # latency left, charged to itself alone)
    assert order == ["b", "c", "a"]
    assert elapsed < 1.0  # no patience wait was spent on the stall


def test_becomes_ready_mid_iteration():
    t0 = time.perf_counter()
    launched = [
        ("slow", (None, None, _Buf(t0 + 0.15))),
        ("fast", (None, None, _Buf(t0))),
    ]
    order = [c for c, _h in PairEngine._ready_iter(
        launched, _probe, patience=5.0, poll=0.01)]
    assert order == ["fast", "slow"]


def test_patience_falls_back_to_launch_order():
    t0 = time.perf_counter()
    launched = [
        ("a", (None, None, _Buf(t0 + 30.0))),
        ("b", (None, None, _Buf(t0 + 30.0))),
        ("c", (None, None, _Buf(t0))),
    ]
    order = [c for c, _h in PairEngine._ready_iter(
        launched, _probe, patience=0.1, poll=0.01)]
    assert order[0] == "c"
    assert order[1:] == ["a", "b"]  # oldest-first fallback


def test_numpy_buffers_count_as_ready():
    launched = [("a", (None, None, np.zeros(3))),
                ("b", (None, None, np.zeros(3)))]
    order = [c for c, _h in PairEngine._ready_iter(launched, _probe)]
    assert order == ["a", "b"]


def test_serial_env_restores_launch_order(monkeypatch):
    monkeypatch.setenv("ISOCON_SERIAL_COLLECT", "1")
    t0 = time.perf_counter()
    launched = [("a", (None, None, _Buf(t0 + 30.0))),
                ("b", (None, None, _Buf(t0)))]
    order = [c for c, _h in PairEngine._ready_iter(launched, _probe)]
    assert order == ["a", "b"]
