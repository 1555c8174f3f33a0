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
