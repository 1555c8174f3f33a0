"""CLI: run a declarative pipeline config end to end.

The Logstash-replacement entry point — a user of the reference runs
flows from config; here:

    python -m eventstreams_spark run pipeline.yaml
    python -m eventstreams_spark validate pipeline.yaml
    python -m eventstreams_spark list-steps

Config shape (YAML or JSON):

    source: {format: json, path: /data/in, stream: true, schema: "..."}
    steps:
      - {type: grok, source: line, pattern: "%{IP:client} %{WORD:verb}"}
      - {type: filter, expr: "verb = 'GET'"}
    sink: {format: parquet, path: /data/out,
           checkpointLocation: /data/ck, availableNow: true}

Multi-output fan-out (Logstash `output { if ... }`): replace `sink`
with a `sinks` list; each entry takes an optional per-sink `filter`
expression (rows may match several sinks — filters are independent):

    sinks:
      - {filter: "status_class = 'server_error'", format: parquet,
         path: /data/errors}
      - {format: parquet, path: /data/all}

Streaming fan-out defaults to one query per sink (independent
checkpoints + exactly-once file logs). Add `fanout:` for the
single-pass shape — ONE foreachBatch query, each micro-batch
persisted and written to every sink from the cache (source scanned
once per batch; sink writes at-least-once on retry):

    fanout: {checkpointLocation: /data/ck, availableNow: true}

Custom sources (event_generator / event_spool / es_bulk) are
registered automatically so configs can name them like built-ins.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_config(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml
        except ImportError as e:  # pragma: no cover - yaml is bundled here
            raise SystemExit("pyyaml not available; use a .json config") from e
        return yaml.safe_load(text)
    return json.loads(text)


def cmd_validate(config: dict) -> None:
    from .pipeline import Pipeline

    Pipeline.from_config(config)  # compile errors surface here
    if "source" not in config:
        raise SystemExit("config missing 'source'")
    if "sink" not in config and "sinks" not in config:
        raise SystemExit("config missing 'sink' (or 'sinks')")
    if "sink" in config and "sinks" in config:
        raise SystemExit("config has both 'sink' and 'sinks'; pick one")
    for i, s in enumerate(config.get("sinks") or []):
        if "format" not in s:
            raise SystemExit(f"sinks[{i}] missing 'format'")
    print("config OK:", len(config.get("steps", [])), "steps")


def _compile(config: dict, app_name: str):
    """Shared session + source + pipeline compilation for run/explain —
    ONE code path so `explain` always predicts exactly what `run`
    executes (new source registrations land in both automatically)."""
    from .pipeline import Pipeline, read_source
    from .session import get_spark
    from .sources import register_es_bulk, register_generator, register_spool

    spark = get_spark(app_name)
    register_generator(spark)
    register_spool(spark)
    register_es_bulk(spark)
    pipe = Pipeline.from_config(config)
    df = read_source(spark, config["source"])
    return spark, pipe.apply(df)


def _fanout_single_pass(out, sinks: list[dict], fanout_conf: dict):
    """Single-pass streaming fan-out: ONE foreachBatch query, the
    micro-batch persisted once, every sink written from the cache —
    the source/parse chain runs once per batch no matter how many
    sinks. The fan-out query owns the ONE checkpoint
    (``fanout.checkpointLocation``); per-sink checkpointLocation /
    availableNow keys are rejected (they belong to the
    one-query-per-sink shape). Sink writes inside foreachBatch are
    at-least-once on batch retry (Logstash-output semantics); use the
    default per-sink-query shape when per-sink exactly-once file
    logs matter more than single-scan ingest."""
    from .pipeline import write_sink

    sink_confs = []
    for i, sconf in enumerate(sinks):
        sconf = dict(sconf)
        for bad in ("checkpointLocation", "availableNow"):
            if bad in sconf:
                raise SystemExit(
                    f"sinks[{i}]: '{bad}' belongs on `fanout:` when "
                    "single-pass fan-out is enabled"
                )
        sink_confs.append(sconf)

    def fn(batch_df, batch_id):
        batch_df.persist()
        try:
            for sconf in sink_confs:
                sconf = dict(sconf)
                flt = sconf.pop("filter", None)
                branch = batch_df.filter(flt) if flt else batch_df
                sconf.setdefault("mode", "append")
                write_sink(branch, sconf)
        finally:
            batch_df.unpersist()

    return write_sink(
        out, {"format": "foreachBatch", "function": fn, **fanout_conf}
    )


def cmd_run(config: dict, await_seconds: int | None) -> None:
    from .pipeline import split_dead_letters, write_sink

    _, out = _compile(config, "eventstreams-pipeline")
    queries = []
    if "dlq" in config:
        # dead-letter routing (Logstash DLQ): rows tagged by
        # deadletter/date/range/... steps go to the dlq sink, healthy
        # rows to the main sink — tag-don't-drop ends here
        out, dead = split_dead_letters(out)
        queries.append(write_sink(dead, config["dlq"]))
    persisted = False
    if "sinks" in config:
        # multi-output fan-out (the Logstash `output { if ... }`
        # idiom): ONE source/pipeline, N sinks, each with an optional
        # per-sink `filter` expression. A row can land in several
        # sinks (filters are independent, not a partition). Streaming:
        # one query per sink over the shared plan — Spark's standard
        # fan-out shape (each sink keeps its own checkpoint and
        # exactly-once file-sink log) — or, with `fanout: {...}`,
        # a SINGLE foreachBatch query that persists each micro-batch
        # and writes every sink from the cache, so the source is
        # scanned once per batch regardless of sink count (the
        # 100 TB/day ingest shape, SCALE.md §26; sink writes become
        # at-least-once on batch retry, like Logstash outputs).
        # Batch: each write is its own action, so the shared frame is
        # persisted once and every sink filters the cached rows
        # instead of re-running the source scan + parse chain N times.
        if out.isStreaming and "fanout" in config:
            queries.append(
                _fanout_single_pass(out, config["sinks"], config["fanout"])
            )
        else:
            if not out.isStreaming and len(config["sinks"]) > 1:
                out = out.persist()
                persisted = True
            for sconf in config["sinks"]:
                sconf = dict(sconf)
                flt = sconf.pop("filter", None)
                branch = out.filter(flt) if flt else out
                queries.append(write_sink(branch, sconf))
    else:
        queries.append(write_sink(out, config["sink"]))
    for q in queries:
        if q is not None:  # streaming query
            q.awaitTermination(await_seconds) if await_seconds else q.awaitTermination()
    if persisted:
        out.unpersist()
    print("done")


def cmd_explain(config: dict) -> None:
    """Compile the pipeline and print its physical plan plus a
    scale summary (shuffle/scan/Python-eval operator counts) WITHOUT
    running it — the pre-flight check for 'will this config shuffle
    my 100 TB corpus more than it must'."""
    from .plans import formatted_plan, operator_counts

    _, out = _compile(config, "eventstreams-explain")
    print(formatted_plan(out))
    counts = operator_counts(out)
    shuffles = sum(n for op, n in counts.items() if op.startswith("Exchange"))
    scans = sum(n for op, n in counts.items() if op.startswith("Scan"))
    python = sum(
        n
        for op, n in counts.items()
        if op.startswith(("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))
    )
    print(f"-- shuffles: {shuffles}  scans: {scans}  python-evals: {python}")


def cmd_index(sf_dir: str, prune: bool = False) -> None:
    """Pre-build the shared suffix-array index for a corpus dir — the
    explicit form of the build-on-miss materialization every
    L2-suffixarray query does implicitly (SCALE.md §24). A production
    run schedules this right after a corpus snapshot lands so the
    first analyst query doesn't pay the build. ``--prune``
    additionally evicts stale fingerprint entries for the SAME input
    dir (a re-minted corpus leaves the old entry as a dead directory
    otherwise) and sweeps crashed builders' tmp dirs."""
    from .queries.llm import (
        _sa_cache_path,
        _suffix_array_lcp_frame,
        sa_cache_prune,
    )
    from .session import get_spark

    spark = get_spark("eventstreams-index")
    frame = _suffix_array_lcp_frame(spark, sf_dir)
    print(f"index ready: {_sa_cache_path(sf_dir)} ({frame.count()} suffixes)")
    if prune:
        kept, removed = sa_cache_prune(sf_dir)
        print(f"pruned {len(removed)} stale entr{'y' if len(removed) == 1 else 'ies'}, {len(kept)} kept")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="eventstreams_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("run", "validate", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("config")
        if name == "run":
            sp.add_argument("--await-seconds", type=int, default=None)
    sub.add_parser("list-steps")
    sp = sub.add_parser("index")
    sp.add_argument("sf_dir")
    sp.add_argument("--prune", action="store_true")
    args = p.parse_args(argv)

    if args.cmd == "list-steps":
        from .pipeline import step_types

        print("\n".join(step_types()))
        return
    if args.cmd == "index":
        cmd_index(args.sf_dir, prune=args.prune)
        return
    config = load_config(args.config)
    if args.cmd == "validate":
        cmd_validate(config)
    elif args.cmd == "explain":
        cmd_explain(config)
    else:
        cmd_run(config, args.await_seconds)


if __name__ == "__main__":
    main()
