"""Churn-robustness of the bench self-attestation counters.

The external-cores metric pairs two `/proc` samples; the original
implementation summed the live subtree's ACCUMULATED jiffies, so a
subtree process dying between samples took its whole pre-window CPU
history out of the second sum — fabricating impossible readings
(observed: 115.9 "external cores" on a 32-core host when a
local-cluster executor's Python workers were reaped mid-rep).

`_ext_cores` is pure, so the arithmetic is pinned on SYNTHETIC sample
pairs (deterministic on any host); the live-subprocess integration
tests are gated on a quiet host because on a busy one they would
correctly measure the other tenants — the first run of this file
during a concurrent 32-core bench read ext≈24, which is the metric
WORKING, not failing.
"""

from __future__ import annotations

import subprocess
import sys
import time

import pytest

sys.path.insert(0, "/root/repo")
from bench import _CLK_TCK, _ext_cores, _proc_sample  # noqa: E402

WALL = 1.0
J = _CLK_TCK  # jiffies per second


def test_synthetic_survivor_counts_by_delta():
    s0 = (1000 * J, {1: (100 * J, 0)})
    s1 = (1010 * J, {1: (110 * J, 0)})  # we burned all 10 busy seconds
    assert _ext_cores(s0, s1, 10.0) == 0.0


def test_synthetic_external_load_shows_up():
    s0 = (1000 * J, {1: (100 * J, 0)})
    s1 = (1030 * J, {1: (110 * J, 0)})  # 20 busy-s were not ours
    assert _ext_cores(s0, s1, 10.0) == pytest.approx(2.0)


def test_synthetic_dead_child_history_is_corrected():
    """The exact 115.9-core artifact: a child with 2000 s of
    PRE-window CPU dies in-window after burning 5 more seconds.  Its
    full lifetime (2005 s) lands in the parent's reaped counter; the
    pre-window 2000 s we observed at s0 must be subtracted, leaving
    exactly the in-window 5 s as ours — external reads 0."""
    s0 = (9000 * J, {1: (100 * J, 0), 2: (2000 * J, 0)})
    s1 = (9015 * J, {1: (110 * J, 2005 * J)})  # child 2 reaped
    # busy delta 15 s = our 10 (parent) + 5 (child in-window)
    assert _ext_cores(s0, s1, 10.0) == 0.0
    # the legacy summed-jiffy form (no cutime credit, unclamped Δown)
    # read ((b1-b0) - (o1-o0)) with o1 = 110 (child gone from the
    # walk), o0 = 2100 -> Δown = -1990 -> 200.5 fabricated "cores"
    own_delta_legacy = 110 * J - (100 * J + 2000 * J)
    ext_legacy = max(0.0, ((9015 - 9000) * J - own_delta_legacy)
                     / _CLK_TCK / 10.0)
    assert ext_legacy == pytest.approx(200.5)  # the artifact, pinned


def test_synthetic_dead_middle_process_with_reaped_grandchildren():
    """cutime propagates recursively at reap time: when a pid that had
    ITSELF reaped children (r0 > 0) dies in-window, the ancestor's
    reaped counter gains its self lifetime AND its cutime — both the
    pre-window self (j0) and pre-window reaped (r0) observations must
    be subtracted or `own` overcounts and external under-reads."""
    # pid 2: 100 s self + 500 s reaped grandchildren at s0; burns 5
    # more self-seconds in-window, then dies and is reaped by pid 1
    # (whose reaped counter gains 105 + 500 = 605).
    s0 = (9000 * J, {1: (100 * J, 0), 2: (100 * J, 500 * J)})
    s1 = (9035 * J, {1: (110 * J, 605 * J)})
    # busy delta 35 s = our 10 (parent) + 5 (child in-window) + 20 ext
    assert _ext_cores(s0, s1, 10.0) == pytest.approx(2.0)


def test_synthetic_inwindow_spawn_counts_in_full():
    s0 = (1000 * J, {1: (100 * J, 0)})
    s1 = (1012 * J, {1: (110 * J, 0), 7: (2 * J, 0)})  # new child
    assert _ext_cores(s0, s1, 10.0) == 0.0


def test_synthetic_orphan_leaks_conservatively():
    """A pid that dies un-reaped-by-us simply vanishes: its pre-window
    observation is subtracted with no reaped credit, so `own` clamps
    to 0 and the WHOLE busy delta surfaces as external — conservative
    (flags, never hides)."""
    s0 = (1000 * J, {1: (100 * J, 0), 2: (50 * J, 0)})
    s1 = (1020 * J, {1: (110 * J, 0)})  # child 2 gone, nothing reaped
    # own = 10 - 50 -> clamped 0; busy delta 20 / wall 10 = 2 cores
    assert _ext_cores(s0, s1, 10.0) == pytest.approx(2.0)


def _host_quiet() -> bool:
    return float(open("/proc/loadavg").read().split()[0]) < 4.0


@pytest.mark.skipif(not _host_quiet(), reason="host busy: the metric "
                    "would correctly measure other tenants")
def test_live_child_with_pre_window_history_dying_in_window():
    p = subprocess.Popen(
        [sys.executable, "-c",
         "x=0\nfor i in range(60_000_000): x+=i\n"
         "import time; time.sleep(4)"])
    time.sleep(3.5)          # child accumulates ~2s of pre-window CPU
    s0 = _proc_sample()
    t0 = time.time()
    p.wait()                 # child exits mid-window and is reaped
    time.sleep(0.3)
    wall = time.time() - t0
    ext = _ext_cores(s0, _proc_sample(), wall)
    assert ext < 2.0, f"dead-child history leaked into external: {ext}"


@pytest.mark.skipif(not _host_quiet(), reason="host busy: the metric "
                    "would correctly measure other tenants")
def test_live_child_reaped_in_window_counts_as_own():
    s0 = _proc_sample()
    t0 = time.time()
    subprocess.run([sys.executable, "-c",
                    "x=0\nfor i in range(40_000_000): x+=i"])
    wall = time.time() - t0
    ext = _ext_cores(s0, _proc_sample(), wall)
    assert ext < 2.0, f"in-window child's CPU misread as external: {ext}"
