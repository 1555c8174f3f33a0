"""Oracle-parity tests: mirror the driver's t2 check for every query
in the registry that declares oracle SQL (SURVEY.md §5.3.1)."""

from __future__ import annotations

import warnings as _warnings

import pytest

from eventstreams_spark import registry
from tests.util import assert_parity

registry._ensure_loaded()
SPECS = [s for s in registry.REGISTRY.values() if s.oracle is not None]


@pytest.mark.slow  # ~14 min all-registry oracle replay; the driver
# hash-checks declared queries against DuckDB itself, so the default
# tier keeps only the fast structural checks below (see pytest.ini)
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


def test_operators_md_current():
    """OPERATORS.md claims to be the always-current registry index
    (SURVEY §2.12) but drifted 306 vs 331 in r3 (VERDICT r3 #2): one
    data row per registry query, or the test is red until
    `python tools/gen_coverage.py` is rerun."""
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "OPERATORS.md")
    with open(path, encoding="utf-8") as fh:
        lines = [ln for ln in fh if ln.startswith("|")]
    # drop the header and separator rows
    data_rows = [ln for ln in lines if not re.match(r"^\|\s*(Query|---)", ln)]
    assert len(data_rows) == len(registry.all_queries()), (
        f"OPERATORS.md has {len(data_rows)} rows but the registry has "
        f"{len(registry.all_queries())} queries — rerun tools/gen_coverage.py"
    )
    # every registry query appears by name
    text = "".join(data_rows)
    missing = [n for n in registry.all_queries() if f"`{n}`" not in text]
    assert not missing, f"OPERATORS.md missing: {missing[:5]}"
