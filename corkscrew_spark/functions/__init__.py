from corkscrew_spark.functions.json_helpers import register_json_helpers  # noqa: F401
