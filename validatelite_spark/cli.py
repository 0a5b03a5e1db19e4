"""vlite-spark CLI — the reference's ``vlite check`` / ``vlite schema``
commands on Spark (reference: cli/commands/check.py, cli/commands/schema.py;
same UX: per-rule ✓/✗ lines or a JSON payload, exit code 1 iff any rule
FAILED, 2 on usage error).

    python -m validatelite_spark.cli check data.parquet \
        --rule "not_null(text)" --rule "range(n_chars,100,10000)"
    python -m validatelite_spark.cli check data.csv --rules rules.json --json
    python -m validatelite_spark.cli schema data.parquet --schema decl.json
    python -m validatelite_spark.cli filter pages.parquet --output out/
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional

from validatelite_spark.core.results import ExecutionStatus, RuleResult


def _fmt_table(results: list[RuleResult]) -> str:
    lines = []
    mark = {"PASSED": "✓", "FAILED": "✗", "ERROR": "!", "SKIPPED": "-"}
    for r in results:
        m = mark.get(r.status.value, "?")
        extra = (f" failed={r.failed_records}/{r.total_records}"
                 if r.status != ExecutionStatus.ERROR
                 else f" error={r.error_message}")
        lines.append(f" {m} {r.rule_name:32s} {r.status.value:7s}{extra}")
    n_fail = sum(1 for r in results if r.status == ExecutionStatus.FAILED)
    n_err = sum(1 for r in results if r.status == ExecutionStatus.ERROR)
    lines.append(f"---\n{len(results)} rules: "
                 f"{len(results) - n_fail - n_err} passed, "
                 f"{n_fail} failed, {n_err} errors")
    return "\n".join(lines)


def _emit(results: list[RuleResult], as_json: bool) -> int:
    if as_json:
        print(json.dumps({
            "summary": {
                "total_rules": len(results),
                "passed": sum(r.status == ExecutionStatus.PASSED
                              for r in results),
                "failed": sum(r.status == ExecutionStatus.FAILED
                              for r in results),
                "errors": sum(r.status == ExecutionStatus.ERROR
                              for r in results),
            },
            "results": [r.to_dict() for r in results],
        }, default=str))
    else:
        print(_fmt_table(results))
    return 1 if any(r.status == ExecutionStatus.FAILED for r in results) else 0


def main(argv: Optional[list[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="vlite-spark")
    parser.add_argument("--cpus", type=int, default=None)
    sub = parser.add_subparsers(dest="command", required=True)

    p_check = sub.add_parser("check", help="run inline/file rules")
    p_check.add_argument("source")
    p_check.add_argument("--rule", action="append", default=[],
                         help="inline rule expression (repeatable)")
    p_check.add_argument("--rules", help="JSON rules file")
    p_check.add_argument("--table", default=None)
    p_check.add_argument("--json", action="store_true")

    p_schema = sub.add_parser("schema", help="declared-schema validation")
    p_schema.add_argument("source")
    p_schema.add_argument("--schema", required=True,
                          help="JSON {column: type} declaration file")
    p_schema.add_argument("--strict", action="store_true")
    p_schema.add_argument("--case-insensitive", action="store_true")
    p_schema.add_argument("--json", action="store_true")

    p_filter = sub.add_parser("filter", help="run the quality pipeline")
    p_filter.add_argument("source")
    p_filter.add_argument("--output", required=True)
    p_filter.add_argument("--langs", default="en")
    p_filter.add_argument("--max-ppl", type=float, default=None)
    p_filter.add_argument("--checkpoint", action="store_true")
    p_filter.add_argument("--buckets", type=int, default=64)
    p_filter.add_argument("--json", action="store_true")

    args = parser.parse_args(argv)

    # parse rules BEFORE starting a session: usage errors exit 2 fast
    if args.command == "check":
        from validatelite_spark.core.rule_parser import (
            RuleParseError,
            load_rules_file,
            parse_rules,
        )
        try:
            rules = parse_rules(args.rule)
            if args.rules:
                rules += load_rules_file(args.rules)
        except (RuleParseError, OSError) as e:
            print(f"usage error: {e}", file=sys.stderr)
            return 2
        if not rules:
            print("usage error: no rules given (use --rule/--rules)",
                  file=sys.stderr)
            return 2

    from validatelite_spark.session import get_spark
    from validatelite_spark.sources.reader import SourceError, read_source

    spark = get_spark("vlite-spark-cli", cpus=args.cpus)
    try:
        try:
            df = read_source(spark, args.source)
        except SourceError as e:
            print(f"source error: {e}", file=sys.stderr)
            return 2

        if args.command == "check":
            from validatelite_spark.operators.engine import RuleEngine
            results = RuleEngine(spark).execute(
                df, rules, table_name=args.table or args.source)
            return _emit(results, args.json)

        if args.command == "schema":
            from validatelite_spark.core.rules import schema_rule
            from validatelite_spark.operators.engine import RuleEngine
            decl = json.loads(open(args.schema).read())
            rule = schema_rule(decl, strict_mode=args.strict,
                               case_insensitive=args.case_insensitive)
            results = RuleEngine(spark).execute(df, [rule])
            return _emit(results, args.json)

        if args.command == "filter":
            from validatelite_spark.pipeline.quality import (
                PipelineConfig,
                QualityPipeline,
            )
            cfg_kwargs = {"allowed_langs": tuple(args.langs.split(","))}
            if args.max_ppl is not None:
                cfg_kwargs["max_ppl"] = args.max_ppl
            pipe = QualityPipeline(spark, PipelineConfig(**cfg_kwargs))
            if args.checkpoint:
                from validatelite_spark.pipeline.checkpoint import (
                    run_checkpointed,
                )
                run_checkpointed(df, pipe.annotate, args.output,
                                 n_buckets=args.buckets,
                                 progress=lambda m: print(m, file=sys.stderr))
                _, results = pipe.run(
                    spark.read.parquet(args.output))
            else:
                _, results = pipe.run(df, output_path=args.output)
            return _emit(results, args.json)

        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
