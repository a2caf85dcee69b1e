"""As-of join operator: semantics vs a brute-force oracle, direction /
tolerance / no-match behavior, determinism contract, and the one-shuffle
plan shape (the scale property the sort-merge formulation exists for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_tfdata_spark.operators.asof import asof_join

LEFT = [
    # (event_id, key, t)
    (1, "a", 10),
    (2, "a", 20),
    (3, "a", 25),
    (4, "b", 5),
    (5, "b", 50),
    (6, "c", 7),  # key with no right rows at all
]
RIGHT = [
    # (key, t, val)
    ("a", 10, 1.0),   # tie with left t=10 -> inclusive match
    ("a", 21, 2.0),
    ("b", 30, 3.0),
]


def _brute(direction="backward", tolerance=None):
    out = {}
    for eid, k, t in LEFT:
        if direction == "backward":
            cand = [(rt, v) for rk, rt, v in RIGHT if rk == k and rt <= t]
            best = max(cand) if cand else None
        else:
            cand = [(rt, v) for rk, rt, v in RIGHT if rk == k and rt >= t]
            best = min(cand) if cand else None
        if best is not None and tolerance is not None and abs(best[0] - t) > tolerance:
            best = None
        out[eid] = best
    return out


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(LEFT, "event_id long, k string, t long")
    right = spark.createDataFrame(RIGHT, "k string, t long, val double")
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 4])
def test_matches_brute_force(spark, frames, direction, tolerance):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="t", direction=direction,
        tolerance=tolerance, unique_right=True,
    )
    got = {
        r["event_id"]: (None if r["matched_ts"] is None else (r["matched_ts"], r["val"]))
        for r in out.collect()
    }
    assert got == _brute(direction, tolerance)
    assert out.count() == len(LEFT)  # left join: every left row survives


def test_inclusive_tie_and_prefix(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="t", unique_right=True,
                    right_prefix="r_")
    row = {r["event_id"]: r for r in out.collect()}[1]
    # left t=10 matches right t=10 (inclusive), via prefixed columns
    assert row["r_matched_ts"] == 10 and row["r_val"] == 1.0


def test_determinism_contract_and_collisions(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="unique_right"):
        asof_join(left, right, on="k", left_ts="t")
    # right payload column colliding with a left column requires a prefix
    right2 = right.withColumnRenamed("val", "event_id")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right2, on="k", left_ts="t", unique_right=True)
    ok = asof_join(left, right2, on="k", left_ts="t", unique_right=True,
                   right_prefix="r_")
    assert "r_event_id" in ok.columns


def test_null_payload_does_not_mix_rows(spark):
    """The carried right row is ONE struct: a NULL payload value in the
    true as-of match must come through as NULL, not be backfilled from an
    older right row (per-column last(ignorenulls) regression)."""
    left = spark.createDataFrame([(1, "a", 30)], "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("a", 10, 5.0, "x"), ("a", 20, None, "y")],
        "k string, t long, val double, tag string",
    )
    row = asof_join(left, right, on="k", left_ts="t", unique_right=True).collect()[0]
    assert row["matched_ts"] == 20 and row["tag"] == "y"
    assert row["val"] is None  # NOT 5.0 from the t=10 row


def test_prefixed_collision_detected(spark, frames):
    """Prefix collisions are validated too: right payload 'val' with
    prefix 'r_' against a left column literally named 'r_val'."""
    left, right = frames
    left2 = left.withColumn("r_val", F.lit(0.0))
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right, on="k", left_ts="t", unique_right=True,
                  right_prefix="r_")


def test_single_shuffle_plan(spark, frames):
    """The whole point vs join+argmax: ONE hash exchange on the key, no
    range blow-up, no broadcast — survives 100x on either side."""
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="t", unique_right=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_timestamp_tolerance_seconds(spark):
    left = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:30")], "event_id long, k string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 9.0)], "k string, ts string, val double"
    ).withColumn("ts", F.to_timestamp("ts"))
    hit = asof_join(left, right, on="k", left_ts="ts", unique_right=True,
                    tolerance=30).collect()[0]
    assert hit["val"] == 9.0
    miss = asof_join(left, right, on="k", left_ts="ts", unique_right=True,
                     tolerance=29).collect()[0]
    assert miss["val"] is None and miss["matched_ts"] is None
