"""The sf1 sweep's linear chain-oracle rewrites must stay value-equal
to the certified recursive SQL (tools/scale_oracles.py selfcheck).

The full-registry sweep at /tmp/sf1 verifies 11 chain-family entries
against these rewrites because the certified WITH RECURSIVE forms
rescan the event table per step (super-linear at 1M events; one
burned 35+ min of 22-core DuckDB, another spilled 80 GB). The
rewrites walk the chain in O(N)/O(N log N) Python and run the
certified tail SQL verbatim — this test pins the equivalence proof
the sweep relies on, at the suite's sf_dir, on every run.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from scale_oracles import selfcheck  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_rewrites_match_certified_recursive_sql():
    assert selfcheck(SF_DIR)
