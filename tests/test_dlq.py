"""Dead-letter queue: parse failures are tagged and routable instead
of silently nulled (Logstash DLQ semantics)."""

from __future__ import annotations

from eventstreams_spark.pipeline import DLQ_COL, Pipeline, split_dead_letters


def test_json_dead_letter_split(spark):
    rows = [
        ("ok1", '{"k": 1}'),
        ("bad", "{not json"),
        ("ok2", '{"k": 2}'),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "id string, payload string")
    pipe = Pipeline.from_config(
        {"steps": [{"type": "json", "source": "payload",
                    "schema": "k int", "dead_letter": True}]}
    )
    good, dead = pipe.apply_split(df)
    good_rows = {r["id"]: r["k"] for r in good.collect()}
    dead_rows = {r["id"]: r[DLQ_COL] for r in dead.collect()}
    # NULL payload is not a parse failure; malformed payload is
    assert good_rows == {"ok1": 1, "ok2": 2, "null": None}
    assert dead_rows == {"bad": "json_parse_error:payload"}
    assert DLQ_COL not in good.columns


def test_date_dead_letter_and_first_reason_wins(spark):
    rows = [
        ("a", '{"when": "2024-01-02 03:04:05"}'),
        ("b", '{"when": "not-a-date"}'),
        ("c", "BROKEN{"),
    ]
    df = spark.createDataFrame(rows, "id string, payload string")
    pipe = Pipeline.from_config(
        {"steps": [
            {"type": "json", "source": "payload",
             "schema": "when string", "dead_letter": True},
            {"type": "date", "source": "when",
             "formats": ["yyyy-MM-dd HH:mm:ss"], "dead_letter": True},
        ]}
    )
    good, dead = pipe.apply_split(df)
    assert [r["id"] for r in good.collect()] == ["a"]
    reasons = {r["id"]: r[DLQ_COL] for r in dead.collect()}
    assert reasons["b"] == "date_parse_error:when"
    # row c failed at the json step; the date step must not overwrite
    assert reasons["c"] == "json_parse_error:payload"


def test_generic_deadletter_gate(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 99.0)], "id int, v double"
    )
    pipe = Pipeline.from_config(
        {"steps": [{"type": "deadletter", "when": "v < 0",
                    "reason": "negative_value"}]}
    )
    good, dead = pipe.apply_split(df)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    assert [r[DLQ_COL] for r in dead.collect()] == ["negative_value"]


def test_split_without_dlq_steps_is_identity(spark):
    df = spark.createDataFrame([(1,)], "id int")
    good, dead = split_dead_letters(df)
    assert good.count() == 1 and dead.count() == 0


def test_redact_step(spark):
    df = spark.createDataFrame(
        [("reach me at a.b@x.io or 10.0.0.1",)], "msg string"
    )
    pipe = Pipeline.from_config(
        {"steps": [{"type": "redact", "fields": ["msg"]}]}
    )
    out = pipe.apply(df).collect()[0]["msg"]
    assert out == "reach me at <EMAIL> or <IP>"
