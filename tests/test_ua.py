"""User-agent parser tests (P15)."""

from __future__ import annotations

from eventstreams_spark.functions.ua import parse_user_agent

UAS = [
    # (ua, family, version, os, os_version, is_bot)
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        "Chrome", "120.0.0.0", "Windows", "10.0", False,
    ),
    (
        "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) "
        "Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
        "Edge", "120.0.2210.91", "Windows", "10.0", False,
    ),
    (
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) Version/17.1 Safari/605.1.15",
        "Safari", "17.1", "macOS", "10.15.7", False,
    ),
    (
        "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
        "Firefox", "115.0", "Linux", None, False,
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15",
        None, None, "iOS", "17.1", False,
    ),
    ("curl/8.4.0", "curl", "8.4.0", None, None, False),
    (
        "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
        "bot", "2.1", None, None, True,
    ),
    ("weird unknown agent", None, None, None, None, False),
]


def test_parse_user_agent_table(spark):
    df = spark.createDataFrame([(u[0],) for u in UAS], "user_agent string")
    rows = {r.user_agent: r for r in parse_user_agent(df).collect()}
    for ua, fam, ver, os_name, os_ver, bot in UAS:
        r = rows[ua]
        assert r.ua_family == fam, (ua, r.ua_family)
        assert r.ua_version == ver, (ua, r.ua_version)
        assert r.ua_os == os_name, (ua, r.ua_os)
        if os_name == "Linux":
            pass  # version-less OS match
        else:
            assert r.ua_os_version == os_ver, (ua, r.ua_os_version)
        assert r.ua_is_bot == bot, (ua, r.ua_is_bot)
