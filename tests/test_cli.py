"""CLI end-to-end: run a YAML pipeline config file → parquet output."""

from __future__ import annotations

import json

from eventstreams_spark.__main__ import cmd_validate, load_config, main


def test_cli_yaml_pipeline_end_to_end(spark, tmp_path, capsys):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.log").write_text(
        "10.0.0.9 GET 200\n10.0.0.9 POST 500\n10.9.9.1 GET 404\nbad line x\n"
    )
    out = tmp_path / "out"
    cfg = f"""
source:
  format: text
  path: {src}
  stream: true
  schema: "line string"
steps:
  - type: grok
    source: line
    pattern: "%{{IP:client}} %{{WORD:verb}} %{{NONNEGINT:status}}"
  - type: filter
    expr: "status <> ''"
  - type: cidr
    source: client
    networks: ["10.0.0.0/24", "0.0.0.0/0"]
    target: net
sink:
  format: parquet
  path: {out}
  checkpointLocation: {tmp_path}/ck
  availableNow: true
"""
    cfg_path = tmp_path / "pipe.yaml"
    cfg_path.write_text(cfg)

    main(["validate", str(cfg_path)])
    assert "config OK: 3 steps" in capsys.readouterr().out

    main(["run", str(cfg_path), "--await-seconds", "120"])
    rows = sorted(
        (r.client, r.verb, r.status, r.net)
        for r in spark.read.parquet(str(out)).collect()
    )
    assert rows == [
        ("10.0.0.9", "GET", "200", "10.0.0.0/24"),
        ("10.0.0.9", "POST", "500", "10.0.0.0/24"),
        ("10.9.9.1", "GET", "404", "0.0.0.0/0"),
    ]


def test_cli_list_steps(capsys):
    main(["list-steps"])
    steps = capsys.readouterr().out.split()
    assert {"grok", "mutate", "cidr", "useragent", "syslog", "chunk"} <= set(steps)


def test_cli_json_config_and_validation_errors(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"steps": [{"type": "nope"}]}))
    try:
        cmd_validate(load_config(str(bad)))
    except (KeyError, ValueError, SystemExit):
        pass
    else:
        raise AssertionError("unknown step type must fail validation")


def test_cli_explain_prints_plan_and_scale_summary(spark, tmp_path, capsys):
    """`explain` compiles and prints the physical plan + shuffle/scan
    counts without executing the pipeline (no output files appear)."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.log").write_text("10.0.0.9 GET 200\n")
    out = tmp_path / "out"
    cfg = {
        "source": {"format": "text", "path": str(src), "schema": "line string"},
        "steps": [
            {"type": "grok", "source": "line",
             "pattern": "%{IP:client} %{WORD:verb} %{NONNEGINT:status}"},
            {"type": "filter", "expr": "status <> ''"},
        ],
        "sink": {"format": "parquet", "path": str(out)},
    }
    cfg_path = tmp_path / "pipe.json"
    cfg_path.write_text(json.dumps(cfg))
    main(["explain", str(cfg_path)])
    printed = capsys.readouterr().out
    assert "Physical Plan" in printed
    assert "-- shuffles:" in printed
    assert not out.exists()  # nothing ran
