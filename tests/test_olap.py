"""Edge cases for the OLAP operators (group_percentiles, funnel) —
hand-computable fixtures; the driver oracle covers the full tables."""

import datetime as dt

from geotrellis_spark.operators import olap


def test_group_percentiles_hand_computed(spark):
    # group a: values 1..10 (cents 100..1000): p50 idx=floor(9*50/100)=4
    # -> 500; p95 idx=floor(9*95/100)=8 -> 900; p99 idx=8 -> 900
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 7.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["event_type"]: r for r in olap.group_percentiles(df).collect()}
    assert out["a"]["n"] == 10
    assert out["a"]["p50_cents"] == 500
    assert out["a"]["p95_cents"] == 900
    assert out["a"]["p99_cents"] == 900
    # single-element group: every percentile is that element
    assert (out["b"]["p50_cents"], out["b"]["p99_cents"]) == (700, 700)


def test_group_percentiles_ties_and_duplicates(spark):
    # heavy ties: the compressed-frequency path must weight duplicates
    rows = [("a", 1.0)] * 9 + [("a", 2.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = olap.group_percentiles(df).collect()[0]
    # sorted multiset = [100]*9 + [200]; idx50 = 9*50//100 = 4 -> 100;
    # idx99 = 9*99//100 = 8 -> the ninth element, still 100
    assert out["p50_cents"] == 100
    assert out["p99_cents"] == 100
    # p100 would be 200 — prove the tail value is reachable
    out2 = olap.group_percentiles(df, percentiles=(100,)).collect()[0]
    assert out2["p100_cents"] == 200


def test_funnel_strict_ordering(spark):
    t0 = dt.datetime(2024, 1, 1)

    def r(uid, typ, mins):
        return (uid, typ, t0 + dt.timedelta(minutes=mins))

    rows = [
        # u1 completes in order
        r(1, "signup", 0), r(1, "click", 10), r(1, "purchase", 20),
        # u2 clicks BEFORE signup -> stops at step 1
        r(2, "click", 0), r(2, "signup", 10),
        # u3 purchase before click (click after signup) -> stops at 2
        r(3, "signup", 0), r(3, "purchase", 5), r(3, "click", 10),
        # u4 never signs up -> not counted at all
        r(4, "click", 0), r(4, "purchase", 5),
        # u5 same-timestamp click as signup: strict > excludes it
        r(5, "signup", 0), r(5, "click", 0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = olap.funnel(df).collect()[0]
    assert out["step1_users"] == 4  # u1,u2,u3,u5
    assert out["step2_users"] == 2  # u1, u3
    assert out["step3_users"] == 1  # u1


def test_funnel_ties_out_of_order_same_fixture_as_oracle(spark):
    # empty input: zero everywhere, single row
    df = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp"
    )
    out = olap.funnel(df).collect()
    assert len(out) == 1
    assert tuple(out[0]) == (0, 0, 0)
