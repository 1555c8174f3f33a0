"""Change-point detection (CUSUM) — batch form.

Page's CUSUM is a per-key SEQUENTIAL fold (each step depends on the
previous), which no window function expresses. The batch form runs the
identical loop inside ``applyInPandas`` over each key's time-sorted
rows; the streaming twin (``streaming/stateful.py::
cusum_changepoint_stream``) runs the same loop with the carry in
GroupState — the two are asserted equal by
``tests/test_streaming.py::test_cusum_batch_equals_stream``.

Scale: one shuffle by key; the fold is O(rows-per-key) Python over
Arrow batches — parallelism comes from key count (pre-split hot keys
by a coarser time bucket if one series outruns a core, then stitch
like two-level sessionize).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def cusum_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 5.0,
) -> DataFrame:
    """Batch CUSUM: same output schema and semantics as the streaming
    form — (input columns) + s_pos, s_neg, alarm per event."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("s_pos", DoubleType()),
            StructField("s_neg", DoubleType()),
            StructField("alarm", BooleanType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # (ts, event_id) fold order — ts alone leaves duplicate
        # timestamps in nondeterministic partition order (ADVICE r2)
        cols = [ts_col] + [
            c for c in ("event_id",) if c in pdf.columns and c != ts_col
        ]
        pdf = pdf.sort_values(cols, kind="mergesort").copy()
        s_pos = s_neg = 0.0
        pos_out, neg_out, alarms = [], [], []
        for x in pdf[value_col]:
            s_pos = max(0.0, s_pos + (x - target - slack))
            s_neg = max(0.0, s_neg + (target - x - slack))
            fired = s_pos > threshold or s_neg > threshold
            pos_out.append(s_pos)
            neg_out.append(s_neg)
            alarms.append(fired)
            if s_pos > threshold:
                s_pos = 0.0
            if s_neg > threshold:
                s_neg = 0.0
        pdf["s_pos"] = pos_out
        pdf["s_neg"] = neg_out
        pdf["alarm"] = alarms
        return pdf[out_cols]

    return df.groupBy(key_col).applyInPandas(fold, schema=out_schema)
