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
