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
from corkscrew_spark.compliance.pack import PackError, PackLoader, QueryPack
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
    def __init__(self, spark: SparkSession, loader: PackLoader | None = None):
        self.spark = spark
        self.loader = loader or PackLoader()
        self.engine = QueryEngine(spark)

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

    # -- execution ----------------------------------------------------------

    def run_pack(self, namespace: str, params: dict[str, object] | None = None,
                 dry_run: bool = False) -> PackRunResult:
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
        frames: list[DataFrame] = []
        errors: list[str] = []
        for pack in packs:
            bound_params = per_pack_params[pack.namespace]
            for q in pack.queries:
                try:
                    if dry_run:
                        self.engine.validate(q.sql, bound_params)
                        continue
                    res = self.engine.execute(q.sql, bound_params)
                    frames.append(self._conform(res.df, q.id))
                except Exception as ex:  # collect per-control errors, keep going
                    errors.append(f"{pack.namespace}/{q.id}: {ex}")
        if dry_run or not frames:
            empty = self.spark.createDataFrame([], COMPLIANCE_RESULT_SCHEMA)
            return PackRunResult(pack=target, results=empty, errors=errors)
        results = frames[0]
        for f in frames[1:]:
            results = results.unionByName(f)
        return PackRunResult(pack=target, results=results, errors=errors)
