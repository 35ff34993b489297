"""Self-enforcing scale-probe coverage for the driver window (VERDICT
r12 #4): every DRIVER_WINDOW entry must carry either a measured
SCALE_PROBE_100X.json entry or an explicit, machine-checked waiver in
tools/scale_probe.py — so a window rotation can never silently skip
the "would this survive 100 TB" question. The audit also fails on
stale waivers (entry probed AND waived) and dangling waiver
references (a waiver citing a probe entry that does not exist)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_driver_window_probe_coverage():
    from scale_probe import audit_probe_coverage

    problems = audit_probe_coverage(verbose=False)
    assert not problems, "\n".join(problems)
