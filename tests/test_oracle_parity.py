"""Mimic the driver's correctness gate: every queries() entry with an
oracle must match DuckDB on the smoke-scale tables."""

from __future__ import annotations

import pytest

from optimizerasters_spark import contract
from tests.oracle_util import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(contract.QUERIES.keys()))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    if name not in contract.ORACLES:
        pytest.skip("rows-only query (no SQL oracle by design)")
    df = contract.QUERIES[name](spark, sf_dir)
    compare(df, duck, contract.ORACLES[name])
