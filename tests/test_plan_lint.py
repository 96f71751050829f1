"""Physical-plan scale audit stays clean.

Runs the same lint as tools/plan_lint.py (CartesianProduct,
BroadcastNestedLoopJoin, single-partition Window input) over every
registered query and asserts nothing appears outside the ALLOW list —
the allowlist entries are all 1-row-build-side broadcasts whose
justification lives next to the rule in tools/plan_lint.py.

Linted at sf0.001 to keep the eager plan-construction queries (the
localCheckpoint-based ones) fast; join-strategy choices are identical
at these toy sizes, and the committed PLANLINT.md remains the sf0.01
record.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_no_unallowlisted_plan_violations(spark):
    from tools.plan_lint import run

    violations, results, errors = run(
        write_md=False, spark=spark, sf_dir="/root/testdata/sf0.001"
    )
    assert violations == {}, f"un-allowlisted plan anti-patterns: {violations}"
    assert errors == {}, f"queries whose plan could not be built: {errors}"
