"""Every registered query runs end-to-end at sf0.001 and returns at
least one row (verified: none of the fixtures' predicates is empty at
this scale — a 0-row result would make its oracle compare vacuous)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _ids():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries())


@pytest.mark.parametrize("qid", _ids())
def test_query_returns_rows(spark, queries, qid):
    assert queries[qid](spark, SF_SMOKE).count() > 0
