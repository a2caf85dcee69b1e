"""Correctness oracle: sequential CDC apply in pandas (FIXTURES.md §Oracle).

Applies a change stream one event at a time in total (ts, lsn, src_part)
order into a dict keyed by (conv_id, turn_idx) — the trivially-correct
semantics the distributed engine must reproduce. The comparison discipline
is the reference's: order-insensitive record equality
(test/tfrecord_test.go:167-176 protobuf.Equal over collected sets), then
stable (conv_id, turn_idx) ordering with per-turn text equality
(BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd


def sequential_apply(changes: pd.DataFrame, payload_cols: list[str]) -> pd.DataFrame:
    """Apply events in (ts, lsn, src_part) order; D removes the key."""
    ordered = changes.sort_values(["ts", "lsn", "src_part"], kind="mergesort")
    state: dict = {}
    for row in ordered.itertuples(index=False):
        key = (row.conv_id, row.turn_idx)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = {c: getattr(row, c) for c in payload_cols}
    rows = [
        {"conv_id": k[0], "turn_idx": k[1], **v} for k, v in state.items()
    ]
    cols = ["conv_id", "turn_idx"] + payload_cols
    out = pd.DataFrame(rows, columns=cols)
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def assert_final_state_equal(engine_df, oracle_pdf: pd.DataFrame) -> None:
    """engine_df: Spark DataFrame of the user-facing table. Compares under
    stable (conv_id, turn_idx) ordering with per-turn text equality."""
    got = (
        engine_df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got = got[list(oracle_pdf.columns)]
    assert len(got) == len(oracle_pdf), f"row count {len(got)} != {len(oracle_pdf)}"
    pd.testing.assert_frame_equal(got, oracle_pdf, check_dtype=False)
