"""Differential oracle tests: every registered query vs its DuckDB twin
at sf0.001 (fast). tools/check.py runs the same comparison at sf0.01,
the driver's correctness scale."""

from __future__ import annotations

import pytest

from ukis_kafka_spark import api

from .conftest import SF_SMOKE
from .util import assert_parity

QUERY_NAMES = sorted(api.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck_smoke, name):
    qs = api.queries()
    oracles = api.oracle_sql()
    sdf = qs[name](spark, SF_SMOKE)
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only: must at least execute
        return
    assert_parity(sdf, duck_smoke, oracles[name], name)


def test_priority_ordering_is_exact_and_complete():
    """queries() must lead with _PRIORITY verbatim (the driver's
    correctness gate reads the first N entries in dict order) and still
    expose every registered query exactly once."""
    from ukis_kafka_spark.api import _PRIORITY, QUERIES

    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate in _PRIORITY"
    ordered = list(api.queries())
    assert ordered[: len(_PRIORITY)] == _PRIORITY
    assert set(ordered) == set(QUERIES) and len(ordered) == len(QUERIES)
