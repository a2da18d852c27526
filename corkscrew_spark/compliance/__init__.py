from corkscrew_spark.compliance.executor import ComplianceExecutor  # noqa: F401
from corkscrew_spark.compliance.pack import PackLoader, QueryPack  # noqa: F401
