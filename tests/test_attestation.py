"""Churn-robustness of the bench self-attestation counters.

The external-cores metric pairs two `/proc` samples; the original
implementation summed the live subtree's ACCUMULATED jiffies, so a
subtree process dying between samples took its whole pre-window CPU
history out of the second sum — fabricating impossible readings
(observed: 115.9 "external cores" on a 32-core host when a
local-cluster executor's Python workers were reaped mid-rep).  These
tests pin the per-pid/reaped-child replacement on real subprocesses.
"""

from __future__ import annotations

import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from bench import _ext_cores, _proc_sample  # noqa: E402


def test_quiet_window_reads_near_zero():
    s0 = _proc_sample()
    t0 = time.time()
    time.sleep(0.5)
    wall = time.time() - t0
    ext = _ext_cores(s0, _proc_sample(), wall)
    # host may genuinely be busy (shared sandbox) — only sanity-bound
    assert 0.0 <= ext <= 64.0


def test_child_with_pre_window_history_dying_in_window():
    """The exact artifact: CPU burned BEFORE s0 by a child that exits
    between s0 and s1 must NOT surface as external load (its lifetime
    total lands in our cutime; the s0-observed part is subtracted)."""
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
    assert ext < 1.0, f"dead-child history leaked into external: {ext}"


def test_child_spawned_and_reaped_in_window_counts_as_own():
    """CPU burned by a child whose whole life fits in the window is
    ours, not external."""
    s0 = _proc_sample()
    t0 = time.time()
    subprocess.run([sys.executable, "-c",
                    "x=0\nfor i in range(40_000_000): x+=i"])
    wall = time.time() - t0
    ext = _ext_cores(s0, _proc_sample(), wall)
    assert ext < 1.0, f"in-window child's CPU misread as external: {ext}"


def test_live_child_counts_by_delta():
    p = subprocess.Popen(
        [sys.executable, "-c",
         "x=0\nfor i in range(200_000_000): x+=i"])
    time.sleep(0.5)
    s0 = _proc_sample()
    t0 = time.time()
    time.sleep(1.0)
    wall = time.time() - t0
    s1 = _proc_sample()
    p.kill()
    p.wait()
    assert p.pid in s1[1], "live child missing from the subtree walk"
    ext = _ext_cores(s0, s1, wall)
    assert ext < 1.5, f"live child's burn misread as external: {ext}"
