"""Network scalar functions (SURVEY §2.8 URL/net — Logstash ``cidr``).

CIDR containment as pure Column arithmetic: dotted-quad → uint32 via
split + shifts, mask compare against the network address. Stays inside
whole-stage codegen (no UDF), so an IP-allowlist filter over 100 TB of
events is just another pushable-ish predicate (the aton math itself
can't push to parquet, but the surrounding plan stays codegen'd and
the expression is branch-free per row).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ip_aton(ip: Column | str) -> Column:
    """Dotted-quad string → numeric (uint32 in a long). NULL for
    malformed input (wrong part count or non-numeric octets)."""
    c = F.col(ip) if isinstance(ip, str) else ip
    parts = F.split(c, r"\.")
    # try_element_at / try_cast: short arrays and non-numeric octets
    # yield NULL (ANSI mode makes the plain forms throw)
    octets = [
        F.try_element_at(parts, F.lit(i + 1)).try_cast("long") for i in range(4)
    ]
    valid = (F.size(parts) == 4) & F.array_min(
        F.array(*[o.isNotNull() & (o >= 0) & (o <= 255) for o in octets])
    )
    num = octets[0] * 16777216 + octets[1] * 65536 + octets[2] * 256 + octets[3]
    return F.when(valid, num)


def cidr_contains(cidr: str, ip: Column | str) -> Column:
    """True when ``ip`` falls inside the (compile-time) CIDR block."""
    net_s, prefix_s = cidr.split("/")
    prefix = int(prefix_s)
    if not 0 <= prefix <= 32:
        raise ValueError(f"bad prefix in {cidr!r}")
    o = [int(x) for x in net_s.split(".")]
    if len(o) != 4 or any(not 0 <= x <= 255 for x in o):
        raise ValueError(f"bad network in {cidr!r}")
    net = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    mask = 0 if prefix == 0 else (0xFFFFFFFF << (32 - prefix)) & 0xFFFFFFFF
    ip_num = ip_aton(ip)
    return (ip_num.bitwiseAND(F.lit(mask))) == F.lit(net & mask)


def cidr_match(ip: Column | str, cidrs: list[str]) -> Column:
    """Logstash ``cidr`` filter: first-matching-network label, NULL if
    none match. ``cidrs`` are compile-time literals (the filter-config
    model), so the whole thing folds into one codegen'd expression."""
    expr = F.lit(None).cast("string")
    for c in reversed(cidrs):
        expr = F.when(cidr_contains(c, ip), F.lit(c)).otherwise(expr)
    return expr
