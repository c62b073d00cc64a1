"""CLI verbs: sync / preview / streams / destination.

Reference: ``packages/core/src/commands/index.ts`` (commander wiring),
``preview.ts:9-48`` (limit-10 preview), ``streams.ts:64-99`` (stream-spec
introspection), ``sync.ts:263-300`` (multi-sync run with per-sync error
isolation and nonzero exit when any failed).

Usage::

    python -m syncmaven_spark.cli sync <project_dir> [--select s1,s2]
        [--full-refresh] [--state DIR] [--sf-dir DIR]
    python -m syncmaven_spark.cli sync --model-sql "select ..." --package file
        --credentials '{"filename": "out.ndjson"}' [--cursor col]
    python -m syncmaven_spark.cli preview <project_dir> <model> [--sf-dir DIR]
    python -m syncmaven_spark.cli streams <package>
"""

from __future__ import annotations

import argparse
import json
import sys

from syncmaven_spark.project import ProjectError, ad_hoc_project, read_project
from syncmaven_spark.runner import run_sync
from syncmaven_spark.session import get_spark, load_tables
from syncmaven_spark.sinks import get_destination
from syncmaven_spark.state import create_store


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="syncmaven-spark")
    sub = p.add_subparsers(dest="command", required=True)

    sync = sub.add_parser("sync", help="run syncs from a project dir or ad-hoc flags")
    sync.add_argument("project_dir", nargs="?", help="project directory")
    sync.add_argument("--select", help="comma-separated sync ids (default: all)")
    sync.add_argument("--full-refresh", action="store_true")
    sync.add_argument("--state", help="state dir/file (default <project>/.state)")
    sync.add_argument("--sf-dir", default=None, help="testdata dir to register as views")
    sync.add_argument("-m", "--model-sql", help="ad-hoc: inline model SQL")
    sync.add_argument("-p", "--package", help="ad-hoc: destination package")
    sync.add_argument("-c", "--credentials", help="ad-hoc: credentials JSON")
    sync.add_argument("--cursor", help="ad-hoc: cursor column")
    sync.add_argument("--stream", help="ad-hoc: stream name")

    preview = sub.add_parser("preview", help="print first 10 rows of a model")
    preview.add_argument("project_dir")
    preview.add_argument("model")
    preview.add_argument("--sf-dir", default=None)

    streams = sub.add_parser("streams", help="describe a destination's streams")
    streams.add_argument("package")

    describe = sub.add_parser(
        "describe", help="describe a destination package (streams overview)"
    )
    describe.add_argument("package")

    explain = sub.add_parser(
        "explain",
        help="print the formatted physical plan of a project model or a "
        "catalog query (q:<name>)",
    )
    explain.add_argument("project_dir", nargs="?", help="project directory "
                         "(omit when explaining a q:<name> catalog query)")
    explain.add_argument("model", help="model name, or q:<catalog query name>")
    explain.add_argument("--sf-dir", default=None)

    return p


def main(argv: list[str] | None = None) -> int:
    try:
        return _main(argv)
    except ProjectError as e:
        print(f"error: {e}")
        return 1


def _main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.command == "describe":
        provider = get_destination(args.package)
        spec = provider.describe()
        print(f"destination: {spec['name']}")
        print(f"streams: {', '.join(spec['streams'])}")
        creds = spec.get("connectionCredentials") or {}
        required = set(creds.get("required", []))
        if creds.get("properties"):
            print("credentials:")
            for name, prop in creds["properties"].items():
                mark = "*" if name in required else " "
                desc = f" — {prop['description']}" if prop.get("description") else ""
                print(f"  {mark} {name}: {prop.get('type', 'any')}{desc}")
        return 0

    if args.command == "streams":
        provider = get_destination(args.package)
        for spec in provider.streams():
            print(f"stream: {spec.name}")
            props = spec.row_type.get("properties", {})
            required = set(spec.row_type.get("required", []))
            for name, prop in props.items():
                types = prop.get("type", "any")
                mark = "*" if name in required else " "
                print(f"  {mark} {name}: {types}")
        return 0

    spark = get_spark(app_name="syncmaven_spark_cli")
    sf_dir = args.sf_dir
    if sf_dir:
        load_tables(spark, sf_dir)

    if args.command == "explain":
        # the perf loop: check PushedFilters / WholeStageCodegen spans /
        # join strategies before trusting a plan at scale
        if args.model.startswith("q:"):
            from syncmaven_spark.queries import CATALOG

            name = args.model[2:]
            if name not in CATALOG:
                print(f"unknown catalog query {name!r}")
                return 1
            df = CATALOG[name].spark_fn(spark, sf_dir or "/root/testdata/sf0.001")
        else:
            if not args.project_dir:
                print("explain requires a project_dir for model queries")
                return 1
            project = read_project(args.project_dir)
            if args.model not in project.models:
                print(f"unknown model {args.model!r}; known: {sorted(project.models)}")
                return 1
            from syncmaven_spark.runner import compile_model

            df = spark.sql(compile_model(project.models[args.model], None))
        df.explain("formatted")
        return 0

    if args.command == "preview":
        project = read_project(args.project_dir)
        if args.model not in project.models:
            print(f"unknown model {args.model!r}; known: {sorted(project.models)}")
            return 1
        from syncmaven_spark.runner import compile_model

        df = spark.sql(compile_model(project.models[args.model], None))
        df.show(10, truncate=False)  # preview.ts:20 maxRows=10
        return 0

    # sync
    if args.model_sql:
        if not args.package:
            print("ad-hoc sync requires --package")
            return 1
        project = ad_hoc_project(
            args.model_sql,
            args.package,
            json.loads(args.credentials or "{}"),
            cursor=args.cursor,
            stream=args.stream,
        )
        store = create_store(args.state or "memory://")
    elif args.project_dir:
        project = read_project(args.project_dir)
        import os

        store = create_store(args.state or os.path.join(args.project_dir, ".state"))
    else:
        print("sync requires a project_dir or --model-sql")
        return 1

    selected = set(args.select.split(",")) if args.select else set(project.syncs)
    unknown = selected - set(project.syncs)
    if unknown:
        print(f"unknown syncs: {sorted(unknown)}; known: {sorted(project.syncs)}")
        return 1

    failures = 0
    for sync_id in sorted(selected):
        sync = project.syncs[sync_id]
        try:
            result = run_sync(spark, sync, store, full_refresh=args.full_refresh)
            print(f"[{sync_id}] {result.stats.as_dict()} cursor={result.last_cursor}")
        except Exception as e:  # per-sync isolation (sync.ts:286-299)
            failures += 1
            print(f"[{sync_id}] FAILED: {e}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
