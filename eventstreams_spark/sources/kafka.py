"""Kafka source/sink option assembly (SURVEY §2.1 S4, §2.2 K3).

Domain op: Logstash ``kafka`` input/output. Spark ships the Kafka
connector (``format("kafka")``); what an engine owes its users is the
*correct option assembly* — subscribe modes, offset policy, security,
and the value-column contract on the sink side. No broker exists in
CI, so these builders are unit-tested on the option dicts they
produce and the unstarted reader/writer they configure; the formats
themselves are exercised only against a real cluster.

Scale: Kafka partitions map 1:1 onto Spark input partitions —
parallelism is set at the topic, ``minPartitions`` can oversplit for
hot topics; ``maxOffsetsPerTrigger`` bounds micro-batch size so state
and sink commits stay O(batch), not O(backlog), on recovery.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    bootstrap_servers: str,
    *,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    assign: dict[str, list[int]] | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = True,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Build the option map for a Kafka stream read.

    Exactly one of ``subscribe`` (topic list), ``subscribe_pattern``
    (regex), ``assign`` (explicit topic→partitions) must be given —
    the same tri-state Logstash's kafka input exposes as
    ``topics``/``topics_pattern``.
    """
    modes = [m for m in (subscribe, subscribe_pattern, assign) if m is not None]
    if len(modes) != 1:
        raise ValueError("exactly one of subscribe/subscribe_pattern/assign required")
    opts: dict[str, str] = {"kafka.bootstrap.servers": bootstrap_servers}
    if subscribe is not None:
        opts["subscribe"] = subscribe
    if subscribe_pattern is not None:
        opts["subscribePattern"] = subscribe_pattern
    if assign is not None:
        opts["assign"] = json.dumps(assign)
    opts["startingOffsets"] = starting_offsets
    opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    opts.update(extra or {})
    return opts


def kafka_reader(spark: SparkSession, **kwargs):
    """Configured (unstarted) stream reader: ``.load()`` to materialize.

    The loaded frame carries Kafka's fixed schema (key/value binary,
    topic, partition, offset, timestamp); decode with
    ``F.col("value").cast("string")`` + a pipeline ``json``/``csv``
    step — same decode chain as every other source.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader


def kafka_sink_options(
    bootstrap_servers: str,
    *,
    topic: str | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if topic is not None:
        opts["topic"] = topic
    opts.update(extra or {})
    return opts


def kafka_writer(
    df: DataFrame,
    checkpoint: str,
    *,
    value_from: str | list[str] = "value",
    key_from: str | None = None,
    **kwargs,
):
    """Configured (unstarted) Kafka stream writer.

    ``value_from``: a column name used as-is, or a list of columns
    packed to a JSON document (``to_json(struct(...))``) — the
    Logstash ``json`` codec on the output side.
    """
    if isinstance(value_from, list):
        df = df.withColumn("value", F.to_json(F.struct(*value_from)))
    elif value_from != "value":
        df = df.withColumn("value", F.col(value_from).cast("string"))
    if key_from is not None:
        df = df.withColumn("key", F.col(key_from).cast("string"))
    cols = ["value"] + (["key"] if key_from else [])
    writer = df.select(*cols).writeStream.format("kafka").option(
        "checkpointLocation", checkpoint
    )
    for k, v in kafka_sink_options(**kwargs).items():
        writer = writer.option(k, v)
    return writer
