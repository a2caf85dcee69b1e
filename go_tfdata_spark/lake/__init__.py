from go_tfdata_spark.lake.table import LakeTable, Manifest  # noqa: F401
