"""Gate-contract tests for scripts/_loadgate.py (VERDICT r13 #1).

The bench artifacts stamp (loadavg_go, load_waiver) and, since r14,
(fault_probe_go, stall_waiver). These tests pin the gate's contract —
probe returns a positive rate, the wait releases immediately on a
passing probe, and a bounded wait that never passes returns a waiver
instead of blocking — with tiny buffers so the suite stays fast.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from _loadgate import fault_probe, wait_fault_probed, wait_quiet  # noqa: E402


def test_fault_probe_returns_positive_rate():
    gbs = fault_probe(size_bytes=1 << 22)  # 4 MiB: fast even when degraded
    assert gbs > 0.0


def test_wait_fault_probed_releases_on_passing_probe():
    gbs, waiver = wait_fault_probed(threshold_gbs=0.0, timeout_sec=0, size_bytes=1 << 22)
    assert gbs > 0.0
    assert waiver is False


def test_wait_fault_probed_waives_after_bounded_wait():
    # an unreachable threshold with a zero budget must return
    # immediately with the waiver set, not block the round
    gbs, waiver = wait_fault_probed(
        threshold_gbs=float("inf"), timeout_sec=0, size_bytes=1 << 22
    )
    assert gbs > 0.0
    assert waiver is True


def test_wait_quiet_waives_after_bounded_wait():
    la, waiver = wait_quiet(threshold=-1.0, timeout_sec=0)
    assert la >= 0.0
    assert waiver is True


@pytest.mark.parametrize("threshold", [1e9])
def test_wait_quiet_releases_when_quiet(threshold):
    la, waiver = wait_quiet(threshold=threshold, timeout_sec=0)
    assert la < threshold
    assert waiver is False
