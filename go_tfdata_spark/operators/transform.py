"""Per-record transforms — reference §2.3 (T1-T6).

- chained transforms applied in declared order (T1,
  tfdata/transform/transformer.go:48-83) -> `chain(...)`;
- Rename with later-source-wins (T2, transformation.go:54-76) ->
  `rename_last_wins` via reversed `coalesce`;
- identity (T3, transformation.go:78-84) -> `identity`;
- arbitrary per-record map fn (T4, transformation.go:128-142) ->
  `vectorized` (Arrow-batched mapInPandas; never per-row Python, per
  BASELINE.json input_hint);
- typed cast with open-schema fallback (T5/T6, transformer.go:87-204) ->
  `cast_to_schema`.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def identity(df: DataFrame) -> DataFrame:
    """T3 — transformation.go:78-84."""
    return df


def chain(*stages: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
    """T1 — ordered composition (transformer.go:60-62 applies transformations
    in declared order per record; here Catalyst collapses the chain)."""

    def _run(df: DataFrame) -> DataFrame:
        for s in stages:
            df = s(df)
        return df

    return _run


def rename_last_wins(df: DataFrame, dest: str, *srcs: str, keep_srcs: bool = True) -> DataFrame:
    """T2 — Rename{dest, srcs...}: for each src present, copy its value to
    dest; LATER srcs win (transformation.go:58-66). Missing/NULL srcs are
    skipped, so this is coalesce over the reversed src list. The reference
    keeps the original src fields (`keep_srcs=True`)."""
    present = [s for s in srcs if s in df.columns]
    if not present:
        return df
    out = df.withColumn(dest, F.coalesce(*[F.col(s) for s in reversed(present)]))
    return out if keep_srcs else out.drop(*[s for s in present if s != dest])


def vectorized(
    fn: Callable[["pandas.DataFrame"], "pandas.DataFrame"],  # noqa: F821
    schema: T.StructType | str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """T4 — user map function, Arrow-batched (`mapInPandas`): the stage
    receives pandas DataFrame batches, returns transformed batches. If
    `schema` is None the input schema is preserved (pure row-wise update)."""

    def _stage(df: DataFrame) -> DataFrame:
        out_schema = schema if schema is not None else df.schema

        def _map(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(_map, out_schema)

    return _stage


def cast_to_schema(
    df: DataFrame, target: T.StructType, carry_unknown: bool = True
) -> DataFrame:
    """T5/T6 — typed conversion driven by a declared schema (the TypesMap,
    core/example.go:40-46): declared fields are cast to their target types;
    fields NOT in the schema are either carried unchanged (`carry_unknown`,
    the open-schema bytes-fallback stance of transformer.go:135-142 — the
    caller later promotes them via LakeTable.update_schema) or dropped."""
    cols = []
    declared = {f.name: f for f in target.fields}
    for c in df.columns:
        if c in declared:
            cols.append(F.col(c).cast(declared[c].dataType).alias(c))
        elif carry_unknown:
            cols.append(F.col(c))
    # Declared-but-missing fields surface as typed NULLs (additive tolerance).
    for f in target.fields:
        if f.name not in df.columns:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
