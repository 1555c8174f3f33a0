"""Query modules — importing this package populates registry.REGISTRY."""

from . import (  # noqa: F401
    aggregations,
    analysis_extra,
    behavior,
    core,
    extras,
    gates,
    ir_extra,
    iterative_extra,
    joins,
    llm,
    longtail,
    pipeline_demo,
    projections,
    scalars,
    stats_tests,
    textqa,
    timeseries,
    tpch_extra,
    warehouse_extra,
    windows,
)
