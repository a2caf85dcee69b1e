from go_tfdata_spark.plans.pipeline import Pipeline  # noqa: F401
