"""Property-based cross-engine testing of the filter DSL: hypothesis
generates random predicate conjunctions; Spark and DuckDB must agree on
the selected row set for every one of them.

This is the strongest correctness statement about the DSL compiler —
the parametrized parity tests check a handful of hand-picked specs,
this checks the compilation RULES.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from acled_spark.filters import FilterSpec, Predicate, build_filter
from acled_spark.tables import load
from tests.conftest import SF_DIR

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error", "zz-missing"]
_WORDS = ["purch", "ck", "error", "e", "xyz", "10%off", "a_b"]

_str_pred = st.one_of(
    st.tuples(st.just("event_type"), st.just("eq"), st.sampled_from(_EVENT_TYPES)),
    st.tuples(st.just("event_type"), st.just("ne"), st.sampled_from(_EVENT_TYPES)),
    st.tuples(st.just("event_type"), st.just("like"), st.sampled_from(_WORDS)),
    st.tuples(st.just("event_type"), st.just("prefix"), st.sampled_from(_WORDS)),
    st.tuples(
        st.just("event_type"),
        st.just("in"),
        st.lists(st.sampled_from(_EVENT_TYPES), min_size=1, max_size=3).map(tuple),
    ),
)

_num_value = st.floats(min_value=-10.0, max_value=400.0, allow_nan=False).map(
    lambda x: round(x, 2)
)
_num_pred = st.tuples(
    st.just("value"),
    st.sampled_from(["gt", "ge", "lt", "le", "eq", "ne"]),
    _num_value,
)
_between_pred = st.tuples(
    st.just("value"),
    st.just("between"),
    st.tuples(_num_value, _num_value).map(lambda t: (min(t), max(t))),
)
_id_pred = st.tuples(
    st.just("user_id"),
    st.sampled_from(["eq", "in"]),
    st.one_of(
        st.integers(min_value=0, max_value=60),
        st.lists(st.integers(0, 60), min_size=1, max_size=4).map(tuple),
    ),
).filter(lambda t: (t[1] == "in") == isinstance(t[2], tuple))
_null_pred = st.tuples(
    st.sampled_from(["value", "event_type"]),
    st.sampled_from(["isnull", "notnull"]),
    st.none(),
)

_spec = st.lists(
    st.one_of(_str_pred, _num_pred, _between_pred, _id_pred, _null_pred),
    min_size=1,
    max_size=3,
).map(lambda preds: FilterSpec(tuple(Predicate(c, o, v) for c, o, v in preds)))


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_spec)
def test_dsl_compilation_agrees_with_sql(spark, duck, spec):
    ev = load(spark, SF_DIR, "events")
    spark_ids = {
        r[0] for r in spec.apply(ev).select("event_id").collect()
    }
    duck_ids = {
        r[0]
        for r in duck.execute(
            f"SELECT event_id FROM events WHERE {spec.to_sql()}"
        ).fetchall()
    }
    assert spark_ids == duck_ids, spec.to_sql()


def test_build_filter_shorthand_roundtrip(spark, duck):
    spec = build_filter({"event_type": "purch", "value__ge": 100.0})
    assert "LIKE" in spec.to_sql() and ">=" in spec.to_sql()
    with pytest.raises(ValueError, match="unknown filter op"):
        build_filter({"value__frobnicate": 1})
