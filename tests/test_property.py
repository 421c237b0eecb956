"""Property-based tests (hypothesis): operator semantics checked against
plain-Python references on adversarial generated inputs. Few examples
per property (each example runs Spark jobs) but shrinking finds minimal
counterexamples — strictly stronger than the reference's print-and-eyeball
tests (SURVEY §5)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=20000),  # offset seconds
    ),
    min_size=1,
    max_size=40,
)


@given(events_strategy)
@settings(**SETTINGS)
def test_sessionize_matches_python_reference(spark, events):
    from odin_rs_spark.operators.windows import sessionize

    rows = [
        Row(user_id=u, event_id=i, ts=_BASE + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(events)
    ]
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in sessionize(
            spark.createDataFrame(rows),
            key="user_id",
            ts="ts",
            gap_minutes=5,
            tiebreak=["event_id"],
        ).collect()
    }
    # reference: sort per user by (ts, event_id); new session when the
    # gap from the previous event exceeds 300 s
    want = {}
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        prev = by_user.get(r.user_id)
        if prev is None or (r.ts - prev[0]).total_seconds() > 300:
            seq = (prev[1] + 1) if prev else 1
        else:
            seq = prev[1]
        by_user[r.user_id] = (r.ts, seq)
        want[(r.user_id, r.event_id)] = seq
    assert got == want


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=25),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=25),
)


@given(asof_strategy)
@settings(**SETTINGS)
def test_asof_backward_matches_brute_force(spark, data):
    from odin_rs_spark.operators.joins import asof_join

    left_ts, right_ts = data
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_BASE + dt.timedelta(seconds=s), lid=i)
            for i, s in enumerate(left_ts)
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_BASE + dt.timedelta(seconds=s), val=float(s))
            for s in sorted(set(right_ts))
        ]
    )
    got = {
        r.lid: r.val
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    rs = sorted(set(right_ts))
    for i, s in enumerate(left_ts):
        cands = [x for x in rs if x <= s]
        want = float(max(cands)) if cands else None
        assert got.get(i) == want, (i, s, got.get(i), want)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_python(spark, edges):
    from odin_rs_spark.operators.dedup import connected_components
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    df = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges], schema
    )
    got = {
        (r.node, r.component)
        for r in connected_components(df).collect()
    }
    # reference closure
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = set()
    seen: set = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            comp.append(n)
            stack.extend(adj[n] - seen)
        m = min(comp)
        want |= {(n, m) for n in comp}
    assert got == want
