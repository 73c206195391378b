"""Oracle-parity tests: every registered query vs its DuckDB oracle.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json) at
sf0.001 so regressions surface locally before a round runs.
"""

from __future__ import annotations

import pytest

from acled_spark.registry import all_specs
from tests.conftest import assert_parity

_SPECS = all_specs()
_WITH_ORACLE = [name for name, s in sorted(_SPECS.items()) if s.oracle is not None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, _SPECS[name])


def test_all_queries_return_rows(spark):
    """Every query (oracle or not) must run and produce a stable schema,
    and the oracle-LESS queries — whose only other driver check is
    rows-only — must actually produce rows (r7 test review: the old
    version discarded the collect result, so a query regressing to
    0 rows passed a test named ...return_rows)."""
    no_oracle = {n for n, s in _SPECS.items() if s.oracle is None}
    for name, spec in sorted(_SPECS.items()):
        df = spec.builder(spark, "/root/testdata/sf0.001")
        assert df.columns, f"{name}: empty schema"
        rows = df.limit(1).collect()  # smoke-execute the plan
        if name in no_oracle:
            assert rows, f"{name}: oracle-less query returned zero rows"
