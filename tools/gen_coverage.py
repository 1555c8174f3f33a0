"""Generate OPERATORS.md — the SURVEY §2 coverage index, from the
registry (single source of truth). Run: python tools/gen_coverage.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstreams_spark import registry  # noqa: E402

HEADER = """# OPERATORS — registry coverage index (generated)

One row per named query in `__spark_entry__.queries()`; regenerate with
`python tools/gen_coverage.py` after adding operators. `oracle` = the
driver hash-compares against DuckDB; rows-only = driver runs the query
and records row count (non-SQL-expressible per SURVEY §2).

| Query | SURVEY §2 | Check | Summary |
|---|---|---|---|
"""


def main() -> None:
    registry._ensure_loaded()
    # variant links must point at real registry entries
    for name, spec in registry.REGISTRY.items():
        if spec.variant_of is not None and spec.variant_of not in registry.REGISTRY:
            raise SystemExit(
                f"{name}: variant_of {spec.variant_of!r} not in registry"
            )
    rows = []
    for name, spec in sorted(registry.REGISTRY.items(), key=lambda kv: (kv[1].category, kv[0])):
        check = "oracle" if spec.oracle else "rows-only"
        doc = (spec.doc or "").split("\n")[0].strip().rstrip(".")
        if spec.variant_of:
            doc = f"[variant of `{spec.variant_of}`] {doc}"
        rows.append(f"| `{name}` | {spec.category} | {check} | {doc} |")
    out = HEADER + "\n".join(rows) + "\n"
    n_oracle = sum(1 for s in registry.REGISTRY.values() if s.oracle)
    out += (
        f"\nTotals: {len(registry.REGISTRY)} queries, "
        f"{n_oracle} oracle-checked, "
        f"{len(registry.REGISTRY) - n_oracle} rows-only.\n"
    )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(path, "w", encoding="utf-8") as f:
        f.write(out)
    print(f"wrote {path}: {len(registry.REGISTRY)} queries")


if __name__ == "__main__":
    main()
