"""Oracle-parity tests: mirror the driver's t2 check for every query
in the registry that declares oracle SQL (SURVEY.md §5.3.1)."""

from __future__ import annotations

import warnings as _warnings

import pytest

from eventstreams_spark import registry
from tests.util import assert_parity

registry._ensure_loaded()
SPECS = [s for s in registry.REGISTRY.values() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spec, spark, sf_dir):
    warns = assert_parity(spec, spark, sf_dir)
    for w in warns:
        _warnings.warn(f"{spec.name}: {w}")


def test_oracle_type_audit_clean():
    """Every oracle's DuckDB result schema must be free of driver-
    canonicalizer trap types (HUGEINT/DECIMAL/LIST/STRUCT/MAP) — the
    failure class behind ALL eight round-1 driver reds. Wiring the
    audit into the suite makes it impossible to skip after an oracle
    edit (VERDICT r2 #8). No Spark needed: types come from DuckDB
    relation description only (~2 s)."""
    import importlib.util
    import os

    tool = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle_type_audit.py")
    spec = importlib.util.spec_from_file_location("oracle_type_audit", tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main("/root/testdata/sf0.001") == 0, "oracle type audit found traps/errors (see stdout)"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_registry_oracle_names_consistent():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 9
