from smh_to_jsonld_spark.functions import dims, scalars  # noqa: F401
