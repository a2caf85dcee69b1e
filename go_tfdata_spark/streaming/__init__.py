from go_tfdata_spark.streaming.apply import start_ingest  # noqa: F401
