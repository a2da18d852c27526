"""Compliance pack executor: parameter substitution → validated SQL →
output-contract enforcement → unioned results + summary.

Parity: pkg/query/compliance/executor.go — required-column check
(:371-394), parameter substitution incl. (:list) IN-expansion (:397-436),
row conversion/enum validation (:490-567, :588-607), dry-run EXPLAIN
(:247-306), pass/fail summary (cmd/corkscrew/main.go:956-1046).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corkscrew_spark.engine import QueryEngine
from corkscrew_spark.compliance.dialect import duckdb_to_spark
from corkscrew_spark.compliance.pack import (
    ComplianceQuery,
    PackError,
    PackLoader,
    QueryPack,
)
from corkscrew_spark.schema import (
    COMPLIANCE_RESULT_SCHEMA,
    COMPLIANCE_SEVERITIES,
    COMPLIANCE_STATUSES,
)

_REQUIRED_COLS = ("resource_id", "resource_name", "resource_type", "control_id",
                  "control_name", "status", "severity", "details")
_OPTIONAL_COLS = ("region", "remediation")


@dataclass
class PackRunResult:
    pack: QueryPack
    results: DataFrame
    errors: list[str] = field(default_factory=list)

    def summary(self) -> DataFrame:
        return (
            self.results.groupBy("control_id", "status")
            .agg(F.count("*").alias("resources"))
            .orderBy("control_id", "status")
        )


class ComplianceExecutor:
    def __init__(self, spark: SparkSession, loader: PackLoader | None = None,
                 warehouse: dict[str, str] | None = None):
        """``warehouse`` maps table names the pack SQL references (e.g.
        ``aws_resources``) to warehouse table DIRECTORIES: controls with
        simple conjunctive WHEREs then read through zone-map/bloom data
        skipping (QueryEngine.register_warehouse) — a nightly pack over
        a 100 TB estate scans only the files each control's predicate
        can touch, the same pruning the reference's controls inherit
        from DuckDB's row groups."""
        self.spark = spark
        self.loader = loader or PackLoader()
        self.engine = QueryEngine(spark)
        for name, path in (warehouse or {}).items():
            self.engine.register_warehouse(name, path)

    # -- validation ---------------------------------------------------------

    def _conform(self, df: DataFrame, query_id: str) -> DataFrame:
        missing = [c for c in _REQUIRED_COLS if c not in df.columns]
        if missing:
            raise PackError(f"{query_id}: result missing required columns {missing}")
        for c in _OPTIONAL_COLS:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast("string"))
        out = df.select(*[F.col(f.name).cast(f.dataType) for f in COMPLIANCE_RESULT_SCHEMA])
        # enum enforcement happens distributed: any violation -> ERROR row
        # (the reference converts invalid enums to ERROR, executor.go:588-607)
        return out.withColumns(
            {
                "status": F.when(F.col("status").isin(*COMPLIANCE_STATUSES), F.col("status"))
                .otherwise(F.lit("ERROR")),
                "severity": F.when(
                    F.col("severity").isin(*COMPLIANCE_SEVERITIES), F.col("severity")
                ).otherwise(F.lit("INFO")),
            }
        )

    def _adapt(self, df: DataFrame, pack: QueryPack, q: ComplianceQuery) -> DataFrame:
        """Metadata fill + reference-dialect column mapping BEFORE the
        contract check. The reference's shipped pack SQL emits result
        shapes like (status, resource_id, bucket_name, …) without the
        control_id/control_name/resource_type columns its own executor
        demands — those come from the manifest query entry. Mirror that:
        fill control_id/control_name/severity/remediation from query
        metadata when the SQL didn't emit them (any dialect), and for
        duckdb-dialect packs also derive resource_name from the emitted
        name column and resource_type from the manifest's
        provider/resources declaration."""
        cols = set(df.columns)
        if pack.dialect == "duckdb":
            if "resource_name" not in cols:
                for cand in ("name", "bucket_name", "resource_id"):
                    if cand in cols:
                        df = df.withColumn("resource_name", F.col(cand))
                        break
            if "resource_type" not in cols:
                rtype = f"{pack.provider}:{pack.resources[0]}" if pack.provider and pack.resources else "resource"
                df = df.withColumn("resource_type", F.lit(rtype))
            cols = set(df.columns)
        fills = {
            "control_id": q.id,
            "control_name": q.name,
            "severity": q.severity,
            "remediation": q.remediation or None,
        }
        for col, value in fills.items():
            if col not in cols:
                df = df.withColumn(col, F.lit(value).cast("string"))
        return df

    @staticmethod
    def _bind_values(pack: QueryPack, bound: dict[str, object]) -> dict[str, object]:
        """Reference-dialect packs consume list parameters as comma-joined
        strings (untrusted_kms_keys.sql:5 does ``split(:param, ',')``);
        native packs get the list itself for (:param) IN-expansion."""
        if pack.dialect != "duckdb":
            return bound
        return {
            k: ",".join(str(v) for v in val) if isinstance(val, (list, tuple)) else val
            for k, val in bound.items()
        }

    # -- execution ----------------------------------------------------------

    def run_pack(self, namespace: str, params: dict[str, object] | None = None,
                 dry_run: bool = False,
                 controls: list[str] | None = None,
                 tags: list[str] | None = None) -> PackRunResult:
        """Run a pack (with dependencies). ``controls`` restricts to the
        named control ids, ``tags`` to controls carrying any of the tags
        — the reference's `query --control ns/ID` and `--compliance
        --tag t` entry points (cmd/corkscrew/main.go usage :162-166)."""
        packs = self.loader.load_with_dependencies(namespace)
        target = packs[-1]  # dependencies execute first, namespace last
        # Parameters resolve PER PACK (reference executor resolves each
        # pack's declared parameters): each pack in the chain binds its own
        # declared params — defaults applied from its own manifest — fed
        # only the supplied values it declares. A supplied name is rejected
        # only if NO pack in the chain declares it.
        supplied = dict(params or {})
        declared = {p.name for pk in packs for p in pk.parameters}
        unknown = set(supplied) - declared
        if unknown:
            raise PackError(f"unknown parameters: {sorted(unknown)}")
        per_pack_params = {
            pk.namespace: pk.validate_params(
                {k: v for k, v in supplied.items() if k in {p.name for p in pk.parameters}}
            )
            for pk in packs
        }
        def selected(q) -> bool:
            if controls is not None and q.id not in controls:
                return False
            if tags is not None and not set(tags) & set(q.tags):
                return False
            return True

        if controls is not None or tags is not None:
            matched = [q.id for pk in packs for q in pk.queries if selected(q)]
            if not matched:
                raise PackError(
                    f"no controls match controls={controls} tags={tags}")
        frames: list[DataFrame] = []
        errors: list[str] = []
        for pack in packs:
            bound_params = self._bind_values(pack, per_pack_params[pack.namespace])
            for q in pack.queries:
                if not selected(q):
                    continue
                try:
                    sql = duckdb_to_spark(q.sql) if pack.dialect == "duckdb" else q.sql
                    if dry_run:
                        self.engine.validate(sql, bound_params)
                        continue
                    res = self.engine.execute(sql, bound_params)
                    frames.append(self._conform(self._adapt(res.df, pack, q), q.id))
                except Exception as ex:  # collect per-control errors, keep going
                    errors.append(f"{pack.namespace}/{q.id}: {ex}")
        if dry_run or not frames:
            empty = self.spark.createDataFrame([], COMPLIANCE_RESULT_SCHEMA)
            return PackRunResult(pack=target, results=empty, errors=errors)
        results = frames[0]
        for f in frames[1:]:
            results = results.unionByName(f)
        return PackRunResult(pack=target, results=results, errors=errors)
