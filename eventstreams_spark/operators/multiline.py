"""Multiline event reassembly (the Logstash `multiline` codec, batch
form): glue continuation lines (stack traces, wrapped log records,
indented YAML) back onto their parent event.

Spark-first shape: this is NOT a stateful per-row scan (the codec's
single-threaded form) — it is the sessionize pattern: a boundary flag,
one running sum per source partition to mint event ids, and one
ordered reassembly aggregation. One hash shuffle by the source key,
order restored per event from the line number; arbitrarily many
sources reassemble in parallel and a 100 TB log corpus never
serializes through one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def multiline_reassemble(
    df: DataFrame,
    line_col: str,
    order_col: str,
    pattern: str,
    *,
    group_cols: Sequence[str] = (),
    negate: bool = False,
    what: str = "previous",
    sep: str = " ",
) -> DataFrame:
    """Reassemble lines into events.

    A line whose ``line_col`` matches ``pattern`` (inverted when
    ``negate``) is a *continuation*: it joins the previous event
    (``what="previous"``) or the following one (``what="next"``,
    e.g. lines ending in a backslash). Non-continuation lines open a
    new event. Returns one row per event: ``group_cols + [event_id,
    first_line_no, n_lines, message]`` with lines joined by ``sep``
    in ``order_col`` order.
    """
    if what not in ("previous", "next"):
        raise ValueError(f"what must be 'previous' or 'next', got {what!r}")
    keys = list(group_cols)
    if not keys:
        # an unpartitioned window = single-task global sort, the exact
        # scale-killer this repo bans (VERDICT r01 / SCALE.md §3);
        # every real line stream has a source key (file, host, pod)
        raise ValueError(
            "multiline_reassemble requires group_cols (the per-source key); "
            "an ungrouped reassembly would single-partition the whole corpus"
        )
    matched = F.col(line_col).rlike(pattern)
    if negate:
        matched = ~matched
    w = Window.partitionBy(*keys).orderBy(order_col)
    if what == "previous":
        # a non-matching line starts a new event
        start = (~matched).cast("int")
    else:
        # a line starts a new event unless the PREVIOUS line matched
        # (matched lines attach forward)
        prev_matched = F.lag(matched).over(w)
        start = (~F.coalesce(prev_matched, F.lit(False))).cast("int")
    flagged = df.withColumn(
        "event_id",
        F.sum(start).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    parts = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("l")))
    )
    return (
        flagged.groupBy(*keys, "event_id")
        .agg(
            F.min(order_col).alias("first_line_no"),
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(F.transform(parts, lambda x: x["l"]), sep).alias("message"),
        )
    )
