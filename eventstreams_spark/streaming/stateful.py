"""Arbitrary stateful streaming operators (T6/T7).

applyInPandasWithState gives per-key state with Arrow-batched Python —
the escape hatch for semantics Spark's built-in stateful ops can't
express (Logstash ``throttle``/``aggregate``-style accumulation).

Scale notes: state is partitioned by key group (one shuffle), batched
through Arrow, and stored in the state store per (key, operator) — the
Python cost is per key-batch, not per row. Keys must be well-
distributed; a hot key serializes through one Python worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def throttle_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    limit: int,
) -> DataFrame:
    """At most ``limit`` events per key over the stream's lifetime
    (Logstash throttle with no period): a per-key admitted-counter in
    GroupState; rows beyond the limit are dropped.

    Output schema = input schema plus ``n_admitted`` (running count per
    key at admission time).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    # copy, don't .add(): StructType.add mutates in place and would
    # poison the input DataFrame's cached schema object
    out_schema = StructType(
        list(df.schema.fields) + [StructField("n_admitted", LongType())]
    )
    out_cols = [f.name for f in out_schema.fields]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (admitted,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if admitted >= limit:
                continue
            take = pdf.sort_values(ts_col).head(limit - admitted).copy()
            take["n_admitted"] = range(admitted + 1, admitted + len(take) + 1)
            admitted += len(take)
            if len(take):
                yield take[out_cols]
        state.update((admitted,))

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="admitted long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def accumulate_stream(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Logstash ``aggregate`` analog: per-key running sum + count
    emitted once per micro-batch (update-style accumulation over
    arbitrary state)."""

    out_schema = f"{key_col} string, running_sum double, running_count long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, count = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf[value_col].sum())
            count += len(pdf)
        state.update((total, count))
        yield pd.DataFrame(
            {key_col: [key[0]], "running_sum": [total], "running_count": [count]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="total double, cnt long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def throttle_stream_periodic(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    limit: int,
    period_seconds: int = 3600,
) -> DataFrame:
    """At most ``limit`` events per key per event-time bucket of
    ``period_seconds`` — the full Logstash ``throttle`` semantic
    (the lifetime variant above is its period=∞ special case).

    State per key is (bucket_start_epoch, admitted) — two longs, O(1)
    regardless of stream length: entering a new bucket resets the
    counter, so state never grows and no timeout eviction is needed
    for correctness (add one to GC idle keys in production).

    Output: input rows that were admitted, plus ``bucket_start``
    (epoch seconds) and ``n_admitted`` (1-based within the bucket).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("bucket_start", LongType()), StructField("n_admitted", LongType())]
    )
    out_cols = [f.name for f in out_schema.fields]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        bucket, admitted = state.get if state.exists else (-1, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((bucket, admitted))
            return
        batch = pd.concat(chunks).sort_values(ts_col)
        out_rows = []
        for _, row in batch.iterrows():
            epoch = int(row[ts_col].timestamp())
            b = (epoch // period_seconds) * period_seconds
            if b != bucket:
                bucket, admitted = b, 0
            if admitted < limit:
                admitted += 1
                r = row.copy()
                r["bucket_start"] = b
                r["n_admitted"] = admitted
                out_rows.append(r)
        state.update((bucket, admitted))
        if out_rows:
            yield pd.DataFrame(out_rows)[out_cols]

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="bucket long, admitted long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
