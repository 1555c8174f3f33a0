"""Golden test for the elapsed-pairing stateful op (T6, Logstash
``elapsed``) on transformWithStateInPandas — hand-computed expected
pairs, replayed across multiple micro-batches so state carries over."""

from __future__ import annotations

from datetime import datetime

import pytest

from eventstreams_spark.streaming.elapsed import elapsed_stream
from eventstreams_spark.streaming.replay import replay_table, run_to_memory

# ~2 min multi-micro-batch golden — the slow tier (pytest.ini)
pytestmark = pytest.mark.slow


def ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 10, minute, second)


ROWS = [
    # user A: clean pair (10:00 -> 10:05), then end with no start (drop)
    ("A", ts(0), "start"),
    ("A", ts(5), "end"),
    ("A", ts(6), "end"),
    # user B: start replaced by newer start (last-start-wins), then end
    ("B", ts(1), "start"),
    ("B", ts(3), "start"),
    ("B", ts(9), "end"),
    # user C: start never closed -> no output
    ("C", ts(2), "start"),
    # user A again, second interval in a later chunk (state across batches)
    ("A", ts(20), "start"),
    ("A", ts(21, 30), "end"),
]

EXPECTED = {
    ("A", ts(0), ts(5), 300.0),
    ("B", ts(3), ts(9), 360.0),
    ("A", ts(20), ts(21, 30), 90.0),
}


def test_elapsed_pairing_golden(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "user string, ts timestamp, kind string")
    stream = replay_table(spark, df, str(tmp_path), chunks=3, order_col="ts")
    out = elapsed_stream(
        stream, "user", "ts", "kind", "start", "end", timeout="1 hour"
    )
    run_to_memory(out, "t_elapsed", output_mode="append")
    got = {
        (
            r.key,
            datetime.utcfromtimestamp(r.start_us / 1e6),
            datetime.utcfromtimestamp(r.end_us / 1e6),
            r.elapsed_s,
        )
        for r in spark.sql("SELECT * FROM t_elapsed").collect()
    }
    assert got == EXPECTED
