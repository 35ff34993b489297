"""Self-enforcing scale-probe coverage for the FULL catalog (VERDICT
r12 #4, widened from window-only by r13 #4): every registered catalog
entry must carry either a measured SCALE_PROBE_100X.json entry or an
explicit, machine-checked waiver in tools/scale_probe.py — so a window
rotation can never pull a never-probed entry in and silently skip the
"would this survive 100 TB" question. The audit also fails on stale
waivers (entry probed AND waived), dangling waiver references (a
waiver citing a probe entry that does not exist), and unknown waiver
grammar."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_full_catalog_probe_coverage():
    from scale_probe import audit_probe_coverage

    problems = audit_probe_coverage(verbose=False)
    assert not problems, "\n".join(problems)


def test_audit_scope_is_the_full_catalog():
    """Every catalog entry is either probed at 100x or waived — the
    audit's universe must equal the registered catalog exactly."""
    import json

    from scale_probe import PROBE_WAIVERS

    from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog

    catalog = set(get_catalog())
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROBE_100X.json")) as f:
        probed = set(json.load(f)["queries"])
    assert catalog <= (probed | set(PROBE_WAIVERS)), sorted(
        catalog - probed - set(PROBE_WAIVERS)
    )
