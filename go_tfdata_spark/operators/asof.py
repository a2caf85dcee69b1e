"""As-of (temporal) join: attach the latest right-side state at each left ts.

The reference resolves "last write wins" once, at read time (Rename's
last-entry-wins loop, tfdata/transform/transformation.go:58-75, over the
greedy materialize source); an as-of join is the same LWW semantics
applied AT EVERY left timestamp — the canonical CDC-analytics read
("what was this user's last snapshot when the event happened?").

Spark has no ASOF JOIN operator (DuckDB/pandas do), and the naive
restatement — equi-join on key + range predicate + argmax — explodes to a
near-cross-product per key before the argmax prunes it. This is the
sort-merge formulation instead:

  1. tag both sides, union them on (key, ts) with null payload columns for
     the other side's fields;
  2. one window per key ordered by (ts, side) — right rows sort BEFORE
     left rows at equal ts, giving inclusive t_right <= t_left semantics —
     carrying the whole right row forward as ONE struct with
     `last(struct, ignorenulls=True)` (per-column carries would stitch
     different right rows together whenever a payload value is NULL);
  3. keep left rows; apply the optional tolerance as a filter on the
     carried right ts.

Cost at scale: exactly ONE shuffle (hash by key) + an in-partition sort —
the same cost as the equi-join both engines would run anyway, with no
range blow-up and no broadcast requirement on either side. AQE handles
moderate key skew; a single pathological hot key serializes its own sort
(windows cannot be salted without splitting time ranges), which is the
same bound DuckDB's ASOF hits — diagnose with operators.skew.hot_keys.

Determinism: if the right side can hold several rows per (key, ts), the
carried row is plan-order-dependent; pre-aggregate the right side to one
row per (key, ts) (e.g. F.max_by) — asof_join raises unless the caller
passes `unique_right=True` acknowledging this contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    right_prefix: str = "",
    unique_right: bool = False,
) -> DataFrame:
    """For every left row, attach the nearest-preceding (backward) or
    nearest-following (forward) right row with the same key.

    `on`: equality key column(s), present on both sides.
    `left_ts` / `right_ts`: ordering columns (numeric or timestamp; they
      are compared with plain <=, so both sides must share one domain).
    `tolerance`: max |left_ts - right_ts| in the ts column's own units
      (seconds for timestamps); matches farther away become nulls.
    `right_prefix`: prepended to every carried right payload column
      (matched ts arrives as `<prefix>matched_ts`).
    `unique_right`: caller asserts the right side has at most one row per
      (key, ts) — required, because tie order inside one (key, ts) group
      is otherwise nondeterministic.
    """
    if not unique_right:
        raise ValueError(
            "asof_join requires unique_right=True: pre-aggregate the right "
            "side to one row per (key, ts) (e.g. max_by) or the carried row "
            "is nondeterministic"
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    overlap = {f"{right_prefix}{c}" for c in payload} & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")

    lt = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    rt = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
    ).withColumn(_SIDE, F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts (side 0 < 1): inclusive.
    if direction == "backward":
        w = Window.partitionBy(*keys).orderBy(F.asc(_TS), F.asc(_SIDE))
    else:
        # forward: nearest ts >= left ts — scan from the future backwards
        w = Window.partitionBy(*keys).orderBy(F.desc(_TS), F.asc(_SIDE))
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched_ts = f"{right_prefix}matched_ts"
    if matched_ts in left.columns:
        raise ValueError(f"left already has a {matched_ts!r} column")
    # Carry ONE struct per right row (not per-column last(ignorenulls)):
    # when the true as-of match holds a NULL payload value, per-column
    # carries would reach past it to an older right row and stitch
    # columns from different rows together. The struct is null exactly on
    # left rows, so ignorenulls skips only rows, never values.
    carry = F.last(
        F.when(
            F.col(_SIDE) == 0,
            F.struct(
                F.col(_TS).alias("_mts"),
                *[F.col(f"{right_prefix}{c}").alias(f"p{i}") for i, c in enumerate(payload)],
            ),
        ),
        ignorenulls=True,
    ).over(w).alias("_c_row")

    out = (
        u.select("*", carry)
        .filter(F.col(_SIDE) == 1)
        .drop(*[f"{right_prefix}{c}" for c in payload])
        .withColumn(matched_ts, F.col("_c_row._mts"))
    )
    for i, c in enumerate(payload):
        out = out.withColumn(f"{right_prefix}{c}", F.col(f"_c_row.p{i}"))
    out = out.drop("_c_row")
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        # timestamps subtract to an interval; go through epoch-second math
        # (timezone-independent) when the ts column is a timestamp
        lcol, mcol = F.col(_TS), F.col(matched_ts)
        if dict(out.dtypes)[matched_ts].startswith("timestamp"):
            lcol, mcol = lcol.cast("double"), mcol.cast("double")
        keep = F.abs(lcol - mcol) <= tol
        # null out every carried column (incl. matched_ts) outside tolerance
        carried_names = [matched_ts] + [f"{right_prefix}{c}" for c in payload]
        out = out.select(
            *[
                F.when(keep, F.col(c)).otherwise(F.lit(None)).alias(c)
                if c in carried_names
                else F.col(c)
                for c in out.columns
            ]
        )
    return out.drop(_TS, _SIDE)
