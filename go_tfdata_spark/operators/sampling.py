"""Deterministic sampling and dataset-split operators for training-data
pipelines.

All three operators are pure Catalyst expressions over an md5 hash of the
(seed, key) pair, which gives them the three properties a 100 TB pipeline
needs and `rand()` lacks:

- **deterministic**: the same row lands in the same sample/split on every
  run, every retry, every cluster size — no task-retry sampling skew, and
  results are reproducible across engines (the DuckDB oracles restate the
  exact same hash threshold);
- **plan-only**: no driver collect, no count, no state — the sample is a
  filter the optimizer pushes into the scan;
- **leak-proof splits**: `split_assign` hashes the GROUP key (e.g.
  conv_id), so all rows of one conversation land in one split — the
  grouping-unit discipline that keeps eval conversations out of train.

The hash is the lexicographic value of md5's 32-char lowercase hex over
[0, 16^32), compared against a precomputed hex threshold string — string
comparison is identical in every engine, so no bigint conversion is
needed on either side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float, digits: int = 32) -> str:
    """`fraction` of the md5 space as a `digits`-char lowercase hex string:
    md5(x) < threshold holds for ~`fraction` of uniformly hashed keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    out = []
    x = fraction
    for _ in range(digits):
        x *= 16
        d = int(x)
        if d > 15:  # fraction == 1.0
            d = 15
        else:
            x -= d
        out.append("0123456789abcdef"[d])
    return "".join(out)


def _key_hash(key: Column, seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"s{seed}:"), key.cast("string")))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 7
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by hash of `key_col` — stable
    across runs/retries/cluster sizes, pushed down as a plain filter."""
    return df.filter(_key_hash(F.col(key_col), seed) < F.lit(_hex_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    fraction: float,
    seed: int = 7,
) -> DataFrame:
    """Per-stratum deterministic sample: the hash is salted with the
    stratum values, so each stratum is sampled independently at
    ~`fraction` (one stratum's hot keys cannot eat another's budget).
    Expected-fraction semantics (exact-count-per-stratum would need a
    per-stratum sort or count — a shuffle this operator deliberately
    avoids; at training-data scale the binomial deviation is noise)."""
    salted = F.concat(
        F.lit(f"s{seed}:"),
        *[F.col(c).cast("string") for c in strata_cols],
        F.lit(":"),
        F.col(key_col).cast("string"),
    )
    return df.filter(F.md5(salted) < F.lit(_hex_threshold(fraction)))


def split_assign(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    seed: int = 7,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashing its GROUP key: all rows
    sharing `group_col` (a conversation, a document cluster, a user) land
    in the same split — no train/eval leakage across the grouping unit.
    `weights` maps split name -> fraction; fractions must sum to ~1."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _key_hash(F.col(group_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = h < F.lit(_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
