"""Query registry: the SURVEY.md §2 operator manifest, executable.

Each operator from the inventory registers one named query (a plan
builder ``(spark, sf_dir) -> DataFrame``) and, where SQL-expressible,
the equivalent DuckDB oracle SQL. ``__spark_entry__`` exposes this
registry to the driver verbatim.

Determinism contract (SURVEY.md §5.2): alias every computed column
identically in both the Spark builder and the oracle SQL; LIMIT only
under a total order; no unseeded randomness; sort any collect_list.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # DuckDB SQL, None => rows-only check (driver-weak)
    category: str  # SURVEY §2 subsection id, e.g. "A1", "L3"
    doc: str = ""
    variant_of: str | None = None  # same family, different mechanism


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    *,
    oracle: str | None = None,
    category: str = "",
    variant_of: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a named query with its oracle SQL.

    ``variant_of`` cross-links a query that re-covers an existing
    family with a different mechanism (e.g. the r7 zone-map census
    vs the r3 one) so the coverage index reads as intentional depth,
    not registry drift.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, category, (fn.__doc__ or "").strip(), variant_of
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every query module so decorators populate REGISTRY."""
    global _loaded
    if _loaded:
        return
    from . import queries  # noqa: F401  (imports submodules for side effects)

    _loaded = True
