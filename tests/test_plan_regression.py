"""Plan regression gate: recompute every suite query's physical-plan
marker counts and diff them against the COMMITTED docs/PLANS.md. A plan
that silently changes shape — an extra exchange, a join that degrades to
BroadcastNestedLoopJoin, a new Python stage on a JVM path — fails here
immediately instead of surfacing at the next manual audit regeneration.

If a change is INTENTIONAL, regenerate the audit:
    python tools/plan_audit.py docs/PLANS.md
and commit the diff alongside the operator change (the diff is then
visible in review, which is the point)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from plan_audit import audit_rows, parse_plans_md  # noqa: E402

PLANS_MD = os.path.join(REPO, "docs", "PLANS.md")


def test_plans_match_committed_audit(spark, sf_dir):
    from renoir_spark import suite

    committed = parse_plans_md(PLANS_MD)
    assert set(committed) == set(suite.QUERIES), (
        "docs/PLANS.md rows drifted from suite.QUERIES — regenerate: "
        "python tools/plan_audit.py docs/PLANS.md"
    )
    # the audit was generated at sf0.001 with AQE on / 8 shuffle
    # partitions (tools/plan_audit.py session) — the conftest session
    # matches; a different sf would legitimately change broadcast choices
    if os.path.basename(sf_dir.rstrip("/")) != "sf0.001":
        pytest.skip("plan audit is pinned at sf0.001")
    fresh = audit_rows(spark, sf_dir)
    diffs = []
    for name in sorted(committed):
        if fresh[name] != committed[name]:
            delta = {
                k: (committed[name][k], fresh[name][k])
                for k in fresh[name]
                if fresh[name][k] != committed[name][k]
            }
            diffs.append(f"{name}: {delta}")
    assert not diffs, (
        "executed-plan properties changed vs committed docs/PLANS.md "
        "(committed, fresh): " + "; ".join(diffs)
        + " — if intentional: python tools/plan_audit.py docs/PLANS.md"
    )
