"""Property-based testing of the silver MERGE operator: for random
existing/update frames, the invariants of the ON CONFLICT contract must
hold regardless of data shape or partitioning."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from acled_spark.silver import merge_updates

_row = st.tuples(
    st.integers(min_value=0, max_value=6),            # key (small: force collisions)
    st.sampled_from(["a", "b", "c", "d"]),            # payload
    st.integers(min_value=0, max_value=9),            # version/order
)
_frame = st.lists(_row, min_size=0, max_size=12)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(existing=_frame, updates=_frame, nparts=st.sampled_from([1, 3, 8]))
def test_merge_invariants(spark, existing, updates, nparts):
    schema = "k int, payload string, version int"
    e = spark.createDataFrame(existing, schema).repartition(nparts)
    u = spark.createDataFrame(updates, schema).repartition(nparts)
    out = merge_updates(e, u, key="k", order_col="version")
    rows = out.collect()

    # 1. exactly one survivor per key
    keys = [r["k"] for r in rows]
    assert len(keys) == len(set(keys))

    # 2. key set = union of input key sets
    assert set(keys) == {r[0] for r in existing} | {r[0] for r in updates}

    # 3. updates win: any key present in updates yields an update-side row
    upd_by_key = {}
    for k, p, v in updates:
        upd_by_key.setdefault(k, []).append((p, v))
    for r in rows:
        if r["k"] in upd_by_key:
            assert (r["payload"], r["version"]) in upd_by_key[r["k"]]
            # and it carries the max version within the update side
            assert r["version"] == max(v for _, v in upd_by_key[r["k"]])

    # 4. determinism under different partitioning
    out2 = merge_updates(
        e.repartition(nparts + 1), u.repartition(max(1, nparts - 1)),
        key="k", order_col="version",
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))
