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


# --- API-param serialization (source-side pushdown half) --------------------


def test_to_params_pushable_ops():
    from acled_spark.filters import FilterSpec, Predicate

    spec = FilterSpec(
        [
            Predicate("event_type", "eq", "Riots"),
            Predicate("fatalities", "ge", 10),
            Predicate("country", "in", ["Mali", "Chad"]),
            Predicate("actor1", "like", "Military"),
        ]
    )
    params, residual = spec.to_params()
    assert params == {
        "event_type": "Riots",
        "event_type_where": "=",
        "fatalities": "10",
        "fatalities_where": ">=",
        "country": "Mali|Chad",
        "country_where": "=",
        "actor1": "%Military%",
        "actor1_where": "LIKE",
    }
    assert residual == []


def test_to_params_residual_not_silently_dropped():
    from acled_spark.filters import FilterSpec, Predicate

    spec = FilterSpec(
        [
            Predicate("notes", "isnull"),
            Predicate("fatalities", "between", (1, 5)),
            Predicate("actor1", "like", "50% off"),  # literal % can't travel
            Predicate("year", "eq", 2024),
        ]
    )
    params, residual = spec.to_params()
    assert params == {"year": "2024", "year_where": "="}
    assert [p.op for p in residual] == ["isnull", "between", "like"]


def test_to_params_one_pair_per_column():
    from acled_spark.filters import FilterSpec, Predicate

    spec = FilterSpec(
        [Predicate("fatalities", "ge", 1), Predicate("fatalities", "le", 9)]
    )
    params, residual = spec.to_params()
    assert params == {"fatalities": "1", "fatalities_where": ">="}
    assert [p.op for p in residual] == ["le"]


def test_fetch_day_sends_pushable_params():
    from datetime import date

    from acled_spark.filters import FilterSpec, Predicate
    from acled_spark.source import fetch_day

    seen = []

    def fetcher(day, page, limit, params):
        seen.append(dict(params))
        return []

    fetch_day(
        fetcher,
        date(2024, 1, 5),
        limit=10,
        filters=FilterSpec([Predicate("event_type", "eq", "Riots")]),
    )
    assert seen[0]["event_type"] == "Riots"
    assert "where" not in seen[0]


def test_to_params_pipe_value_goes_residual():
    """An IN value containing the OR-list delimiter cannot travel —
    the server would split it and UNDER-fetch (unrecoverable)."""
    from acled_spark.filters import FilterSpec, Predicate

    spec = FilterSpec([Predicate("source", "in", ["A|B", "C"])])
    params, residual = spec.to_params()
    assert params == {}
    assert [p.op for p in residual] == ["in"]


def test_fetch_day_raises_on_unpushable_filters():
    from datetime import date

    import pytest

    from acled_spark.filters import FilterSpec, Predicate
    from acled_spark.source import fetch_day

    def fetcher(day, page, limit, params):
        return []

    spec = FilterSpec([Predicate("fatalities", "between", (1, 5))])
    with pytest.raises(ValueError, match="fatalities:between"):
        fetch_day(fetcher, date(2024, 1, 5), filters=spec)
    # explicit opt-in accepts the superset
    assert fetch_day(
        fetcher, date(2024, 1, 5), filters=spec, allow_partial_pushdown=True
    ) == []


def test_to_params_pipe_in_scalar_values_goes_residual():
    """eq/comparison/LIKE values share the pipe-delimited wire grammar
    with IN — a scalar containing '|' would be server-side OR-split."""
    from acled_spark.filters import FilterSpec, Predicate

    spec = FilterSpec(
        [
            Predicate("source", "eq", "A|B"),
            Predicate("actor1", "like", "X|Y"),
            Predicate("notes", "prefix", "p|q"),
            Predicate("country", "ne", "M|N"),
            Predicate("year", "eq", 2024),  # clean scalar still travels
        ]
    )
    params, residual = spec.to_params()
    assert params == {"year": "2024", "year_where": "="}
    assert sorted(p.column for p in residual) == [
        "actor1", "country", "notes", "source"
    ]


def test_to_params_like_wildcard_chars_go_residual():
    """Engine LIKE semantics are literal (contains/startswith), but the
    API LIKE grammar treats _ as a single-char wildcard and offers no
    escape — pushing 'a_b' would server-match 'aXb' and under-filter.
    Values with _ or \\ stay engine-side; eq (non-LIKE grammar) still
    travels."""
    from acled_spark.filters import FilterSpec, Predicate

    spec = FilterSpec(
        [
            Predicate("actor1", "like", "UNIT_7"),
            Predicate("notes", "prefix", "back\\slash"),
            Predicate("event_type", "eq", "snake_case"),  # eq is literal
            Predicate("source", "like", "clean value"),
        ]
    )
    params, residual = spec.to_params()
    assert params == {
        "event_type": "snake_case",
        "event_type_where": "=",
        "source": "%clean value%",
        "source_where": "LIKE",
    }
    assert sorted(p.column for p in residual) == ["actor1", "notes"]


def test_fetch_day_param_filter_collision_raises():
    """A pushed filter param may not silently overwrite a caller-supplied
    param of the same name (last-writer-wins would desync the _where
    companion)."""
    from datetime import date

    import pytest

    from acled_spark.filters import FilterSpec, Predicate
    from acled_spark.source import fetch_day

    def fetcher(day, page, limit, params):
        return []

    with pytest.raises(ValueError, match="collide.*event_type"):
        fetch_day(
            fetcher,
            date(2024, 1, 5),
            filters=FilterSpec([Predicate("event_type", "eq", "Riots")]),
            params={"event_type": "Protests"},
        )
    # disjoint names still compose
    assert fetch_day(
        fetcher,
        date(2024, 1, 5),
        filters=FilterSpec([Predicate("event_type", "eq", "Riots")]),
        params={"fields": "event_id_cnty"},
    ) == []


def test_fetch_day_where_companion_collision_raises():
    """The clash guard compares FIELDS, not raw keys: a caller-set
    `{col}_where` against a pushed base `{col}` would rewrite the
    operator the filter asked for (eq pushes no _where, so the server
    would apply the caller's operator to the filter's value)."""
    from datetime import date

    import pytest

    from acled_spark.filters import FilterSpec, Predicate
    from acled_spark.source import fetch_day

    def fetcher(day, page, limit, params):
        return []

    with pytest.raises(ValueError, match="collide.*fatalities"):
        fetch_day(
            fetcher,
            date(2024, 1, 5),
            filters=FilterSpec([Predicate("fatalities", "eq", 5)]),
            params={"fatalities_where": ">"},
        )
    # and the mirrored split: caller base key vs pushed _where companion
    with pytest.raises(ValueError, match="collide.*fatalities"):
        fetch_day(
            fetcher,
            date(2024, 1, 5),
            filters=FilterSpec([Predicate("fatalities", "ge", 5)]),
            params={"fatalities": "9"},
        )


def test_bare_string_rejected_for_in_and_between():
    """Round-7 review: Predicate('col', 'in', 'Battles') iterated the
    STRING's characters — isin('B','a',...) plus 'B|a|t|t|l|e|s' pushed
    to the API, silently wrong on both sides.  Construction now fails
    loudly; between additionally pins exactly two bounds."""
    import pytest

    with pytest.raises(TypeError, match="bare"):
        Predicate("event_type", "in", "Battles")
    with pytest.raises(TypeError, match="bare"):
        Predicate("event_type", "between", "ab")
    with pytest.raises(ValueError, match="exactly"):
        Predicate("fatalities", "between", (1, 2, 3))
    # the documented shapes still construct
    Predicate("event_type", "in", ["Battles"])
    Predicate("fatalities", "between", (1, 5))


def test_one_shot_iterator_values_materialized_at_construction():
    """r7 follow-up: validation must not exhaust a one-shot iterable —
    the value is materialized to a tuple once, so to_column()/to_sql()
    can both consume it."""
    p = Predicate("fatalities", "between", iter([1, 5]))
    assert p.value == (1, 5)
    assert "BETWEEN" in p.to_sql()
    p.to_column()  # second consumer — would raise on an exhausted iter
    q = Predicate("event_type", "in", iter(["Riots", "Battles"]))
    assert q.value == ("Riots", "Battles")
    q.to_sql() and q.to_column()


# --- hostile-input hardening (r10 review) ------------------------------------


def test_hostile_column_names_rejected_at_construction():
    """Column names reach three surfaces verbatim — the generated SQL
    WHERE fragment, the API param name, and Spark's column resolver —
    so anything beyond a plain identifier must die at construction,
    not compile into an injected predicate."""
    for evil in (
        "x = 1 OR 1=1 --",
        "event_type; DROP TABLE events",
        'a"b',
        "a'b",
        "a.b",          # Spark would silently resolve as a struct path
        "a b",
        "",
        "1starts_with_digit",
        "col|pipe",
    ):
        with pytest.raises(ValueError, match="invalid filter column"):
            Predicate(evil, "eq", 1)
    with pytest.raises(ValueError, match="invalid filter column"):
        Predicate(None, "eq", 1)
    # the same gate guards the dict shorthand
    with pytest.raises(ValueError, match="invalid filter column"):
        build_filter({"event_type) OR (1=1": "v"})
    # plain identifiers still construct
    Predicate("event_type", "eq", "Riots")
    Predicate("_internal", "eq", 1)
    Predicate("EVENT_TYPE2", "eq", 1)


def test_sql_literal_rejects_unsupported_and_nonfinite_values():
    """The old repr() catch-all let any object with a hostile __repr__
    write itself into the SQL fragment unescaped; now only the six
    literal types render and everything else fails loudly."""
    class Sneaky:
        def __repr__(self):
            return "1); DROP TABLE events; --"

    with pytest.raises(TypeError, match="unsupported filter literal"):
        Predicate("value", "eq", Sneaky()).to_sql()
    with pytest.raises(ValueError, match="non-finite"):
        Predicate("value", "eq", float("nan")).to_sql()
    with pytest.raises(ValueError, match="non-finite"):
        Predicate("value", "eq", float("inf")).to_sql()
    # quote-bearing strings stay VALUES, never syntax
    sql = Predicate("actor1", "eq", "O'Brien'; DROP--").to_sql()
    assert sql == "actor1 = 'O''Brien''; DROP--'"


def test_sql_literal_accepts_numpy_scalars_canonically():
    """ADVICE r10: the whitelist accepts the numeric ABC families, not
    exact built-in types — numpy.int64 is an Integral but NOT an int
    subclass, so callers feeding aggregation results into predicates
    must not regress vs the old repr() path.  Rendering coerces through
    int()/float(), so the text is the CANONICAL literal (never the
    value's own __repr__) and non-finite numpy floats still fail."""
    import numpy as np

    assert Predicate("value", "eq", np.int64(42)).to_sql() == "value = 42"
    assert (
        Predicate("value", "gt", np.float64(2.5)).to_sql() == "value > 2.5"
    )
    assert (
        Predicate("value", "lt", np.float32(0.5)).to_sql() == "value < 0.5"
    )
    with pytest.raises(ValueError, match="non-finite"):
        Predicate("value", "eq", np.float64("inf")).to_sql()
    # bool is an Integral subclass in Python — it must KEEP rendering
    # as a SQL boolean, not the integer 1/0
    assert Predicate("is_valid", "eq", True).to_sql() == "is_valid = TRUE"


def test_quote_bearing_values_agree_across_engines(spark, duck):
    """A value full of quotes/wildcards must filter identically through
    the Spark Column and the generated DuckDB WHERE — proving the
    escaping disciplines line up end-to-end, not just per-helper."""
    hostile = "O'Brien 100%_\\done"
    rows = [
        (1, hostile),
        (2, "O'Brien 100x_\\done"),   # % as wildcard would match this
        (3, "xO'Brien 100%_\\doney"), # prefix vs contains discriminator
        (4, "plain"),
    ]
    planted = spark.createDataFrame(rows, "event_id long, note string")
    duck.execute("DROP TABLE IF EXISTS _hostile_notes")
    duck.execute("CREATE TABLE _hostile_notes (event_id BIGINT, note VARCHAR)")
    duck.executemany(
        "INSERT INTO _hostile_notes (event_id, note) VALUES (?, ?)", rows
    )
    for spec, expect in (
        (FilterSpec([Predicate("note", "eq", hostile)]), {1}),
        (FilterSpec([Predicate("note", "like", "O'Brien 100%")]), {1, 3}),
        (FilterSpec([Predicate("note", "prefix", "O'Brien 100%")]), {1}),
    ):
        spark_ids = {
            r[0]
            for r in planted.filter(spec.to_column()).select("event_id").collect()
        }
        duck_ids = {
            r[0]
            for r in duck.execute(
                f"SELECT event_id FROM _hostile_notes WHERE {spec.to_sql()}"
            ).fetchall()
        }
        assert spark_ids == duck_ids == expect, spec.to_sql()


def test_sql_literal_rejects_lossy_real_coercion():
    """The numeric-ABC widening must not let a lossy Real (Fraction)
    silently turn exact equality into approximate equality on the SQL
    face while the Spark face rejects the type: exact coercions render,
    lossy ones fail loudly."""
    from fractions import Fraction

    assert Predicate("value", "eq", Fraction(1, 2)).to_sql() == "value = 0.5"
    with pytest.raises(ValueError, match="does not coerce to float exactly"):
        Predicate("value", "eq", Fraction(1, 3)).to_sql()
