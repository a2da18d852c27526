"""CLI surface — the reference's verbs over the Spark engine.

    python -m corkscrew_spark.cli query "SELECT ..." [--format table|csv|json]
                                  [--param k=v ...] [--data DIR]
    python -m corkscrew_spark.cli pack run NAMESPACE [--param k=v ...]
    python -m corkscrew_spark.cli pack list
    python -m corkscrew_spark.cli schemas
    python -m corkscrew_spark.cli scan --synthetic N   (file-based provider)

Mirrors cmd/corkscrew/main.go's query/pack/schemas/scan dispatch (:103-247)
minus the cloud-credentialed providers.
"""

from __future__ import annotations

import argparse
import sys

from corkscrew_spark import formatter
from corkscrew_spark.catalog import register_tables
from corkscrew_spark.engine import QueryEngine, QueryValidationError
from corkscrew_spark.session import get_spark, sf_dir


def _parse_params(pairs: list[str] | None) -> dict[str, object]:
    out: dict[str, object] = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise SystemExit(f"--param expects k=v, got: {pair}")
        k, v = pair.split("=", 1)
        out[k] = [s for s in v.split(",")] if "," in v else v
    return out


def cmd_query(args: argparse.Namespace) -> int:
    spark = get_spark(app_name="corkscrew-cli")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, args.data)
    eng = QueryEngine(spark)
    sql = args.sql if args.sql != "-" else sys.stdin.read()
    try:
        res = eng.execute(sql, _parse_params(args.param))
    except QueryValidationError as ex:
        print(f"error: {ex}", file=sys.stderr)
        return 2
    print(formatter.FORMATTERS[args.format](res.df, limit=args.limit))
    print(f"-- {res.duration_s*1000:.0f} ms", file=sys.stderr)
    return 0


def cmd_pack(args: argparse.Namespace) -> int:
    from corkscrew_spark.compliance import ComplianceExecutor, PackLoader

    loader = PackLoader(args.search_path or [])
    if args.pack_cmd == "list":
        for ns in loader.discover():
            print(ns)
        return 0
    spark = get_spark(app_name="corkscrew-cli")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, args.data)
    exe = ComplianceExecutor(spark, loader)
    run = exe.run_pack(args.namespace, _parse_params(args.param), dry_run=args.dry_run)
    if args.dry_run:
        print(f"pack {args.namespace}: {len(run.pack.queries)} controls validated")
    else:
        print(formatter.format_table(run.summary(), limit=1000))
    for err in run.errors:
        print(f"error: {err}", file=sys.stderr)
    return 1 if run.errors else 0


def cmd_schemas(_args: argparse.Namespace) -> int:
    from corkscrew_spark.schema import CORE_TABLES

    for name, schema in CORE_TABLES.items():
        print(f"-- {name}")
        for f in schema.fields:
            nn = "" if f.nullable else " NOT NULL"
            print(f"  {f.name} {f.dataType.simpleString()}{nn}")
    return 0


def cmd_scan(args: argparse.Namespace) -> int:
    from corkscrew_spark.ingest import synthetic

    spark = get_spark(app_name="corkscrew-cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.provider == "aws":
        from corkscrew_spark.ingest import pipeline

        summary = pipeline.run_scan(
            spark, args.out,
            services=(args.services or "s3,ec2,iam,lambda,rds,dynamodb").split(","),
            regions=(args.regions or "us-east-1").split(","),
            use_sdk=args.use_sdk,
        )
        print(f"scan {summary['id']}: {summary['total_resources']} resources "
              f"({summary['new_resources']} new) in {summary['duration_ms']} ms -> {args.out}")
        return 0
    res = synthetic.resources(spark, args.synthetic)
    rel = synthetic.relationships(spark, res)
    ev = synthetic.change_events(spark, res)
    out = args.out
    res.write.mode("overwrite").parquet(f"{out}/resources.parquet")
    rel.write.mode("overwrite").parquet(f"{out}/relationships.parquet")
    ev.write.mode("overwrite").parquet(f"{out}/change_events.parquet")
    print(f"scanned {res.count()} resources, {rel.count()} relationships, "
          f"{ev.count()} change events -> {out}")
    return 0


def cmd_diagram(args: argparse.Namespace) -> int:
    from corkscrew_spark import diagrams

    spark = get_spark(app_name="corkscrew-cli")
    spark.sparkContext.setLogLevel("ERROR")
    res = spark.read.parquet(f"{args.data}/resources")
    rel_path = f"{args.data}/relationships"
    import os as _os
    if _os.path.exists(rel_path):
        rel = spark.read.parquet(rel_path)
    else:
        rel = spark.createDataFrame(
            [], "from_id string, to_id string, relationship_type string")
    nodes, edges = diagrams.diagram_data(
        res, rel, service=args.service, region=args.region, limit=args.limit)
    render = diagrams.render_mermaid if args.format == "mermaid" else diagrams.render_ascii
    print(render(nodes, edges))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="corkscrew-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run read-only SQL")
    q.add_argument("sql")
    q.add_argument("--format", choices=sorted(formatter.FORMATTERS), default="table")
    q.add_argument("--param", action="append")
    q.add_argument("--limit", type=int, default=100)
    q.add_argument("--data", default=sf_dir())
    q.set_defaults(fn=cmd_query)

    p = sub.add_parser("pack", help="compliance packs")
    p.add_argument("pack_cmd", choices=["run", "list"])
    p.add_argument("namespace", nargs="?")
    p.add_argument("--param", action="append")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--search-path", action="append")
    p.add_argument("--data", default=sf_dir())
    p.set_defaults(fn=cmd_pack)

    s = sub.add_parser("schemas", help="print core table DDL")
    s.set_defaults(fn=cmd_schemas)

    sc = sub.add_parser("scan", help="run a provider scan into the warehouse")
    sc.add_argument("--provider", choices=["synthetic", "aws"], default="synthetic")
    sc.add_argument("--services")
    sc.add_argument("--regions")
    sc.add_argument("--use-sdk", action="store_true",
                    help="real boto3 clients (needs credentials + network)")
    sc.add_argument("--synthetic", type=int, default=300)
    sc.add_argument("--out", required=True)
    sc.set_defaults(fn=cmd_scan)

    dg = sub.add_parser("diagram", help="render resources as mermaid/ascii")
    dg.add_argument("--data", required=True, help="warehouse dir with resources[/relationships]")
    dg.add_argument("--format", choices=["mermaid", "ascii"], default="mermaid")
    dg.add_argument("--service")
    dg.add_argument("--region")
    dg.add_argument("--limit", type=int, default=50)
    dg.set_defaults(fn=cmd_diagram)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
