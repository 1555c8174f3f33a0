"""Config-driven pipeline, oracle-checked end to end.

Proves the M2 claim: a declarative Logstash-style step chain compiles
to one Catalyst plan whose result hash-matches plain SQL — i.e. the
pipeline layer adds zero semantic drift over the relational core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..pipeline import Pipeline
from ..registry import query

_TYPE_GROUPS = {
    "click": "engagement",
    "view": "engagement",
    "signup": "conversion",
    "purchase": "conversion",
    "error": "ops",
}

_PIPE = {
    "steps": [
        {"type": "json", "source": "props", "schema": "k int", "target": "p"},
        {"type": "mutate", "add": {"k": "p.k"}, "remove": ["p"]},
        {"type": "filter", "expr": "event_type IN ('click','view','purchase') AND k < 50"},
        {"type": "translate", "source": "event_type", "mapping": _TYPE_GROUPS,
         "target": "type_group", "default": "other"},
        {"type": "mutate", "add": {"value_i": "CAST(floor(value) AS BIGINT)"}},
        {"type": "fingerprint", "fields": ["event_id", "event_type"], "target": "fp",
         "method": "md5"},
        {"type": "prune", "keep": ["event_id", "event_type", "type_group", "k",
                                   "value_i", "fp"]},
    ]
}


@query(
    "pipeline_grok_enrich",
    category="M2",
    oracle="""
        SELECT event_id, event_type,
               CASE event_type
                    WHEN 'click' THEN 'engagement'
                    WHEN 'view' THEN 'engagement'
                    WHEN 'signup' THEN 'conversion'
                    WHEN 'purchase' THEN 'conversion'
                    WHEN 'error' THEN 'ops'
                    ELSE 'other' END                             AS type_group,
               CAST(json_extract(props, '$.k') AS INT)           AS k,
               CAST(floor(value) AS BIGINT)                      AS value_i,
               md5(concat(CAST(event_id AS VARCHAR), '|', event_type)) AS fp
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase')
          AND CAST(json_extract(props, '$.k') AS INT) < 50
    """,
)
def pipeline_grok_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven-step declarative pipeline (json → mutate → filter →
    translate → mutate → fingerprint → prune) over events.

    Scale: the compiled chain is one narrow map stage — Catalyst
    collapses every step into a single WholeStageCodegen project+filter
    over the scan, with the json parse evaluated once (CollapseProject)
    and the filter pushed to the scan.
    """
    return Pipeline.from_config(_PIPE).apply(load_table(spark, sf_dir, "events"))
