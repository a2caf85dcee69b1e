from go_tfdata_spark.sources.changes import (  # noqa: F401
    read_change_log,
    read_change_stream,
    synthetic_changes,
    write_change_log,
)
