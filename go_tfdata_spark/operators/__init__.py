from go_tfdata_spark.operators.lww import lww_latest, lww_latest_window  # noqa: F401
from go_tfdata_spark.operators.merge import apply_changes, fold_changes, replay  # noqa: F401
