"""go_tfdata_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (NOT a port) with the semantic capabilities of
NVIDIA/go-tfdata re-expressed Spark-first:

- keyed record assembly from an unordered member stream
  (reference: tfdata/archive/manager.go:57-63) -> hash aggregation /
  LWW fold per key;
- per-record transformation chains (tfdata/transform/transformer.go:48-83)
  -> composed DataFrame->DataFrame stages + vectorized pandas UDFs;
- last-wins field resolution (tfdata/transform/transformation.go:54-76)
  -> last-writer-wins per key ordered by (ts, lsn);
- empty-record filtering (tfdata/filter/filter.go:28-41) -> tombstone
  folding;
- typed schema mapping w/ bytes fallback (tfdata/core/example.go:40-46)
  -> additive schema evolution on the lake table;
- order-insensitive sink equality (test/tfrecord_test.go:167-176)
  -> final-state equality under stable (conv_id, turn_idx) ordering;
- pluggable pipeline stages (tfdata/pipeline/pipeline.go:132-175)
  -> fluent Pipeline of DataFrame callables;
- parallel unordered sink (tfdata/core/tfrecord.go:124-180)
  -> Spark task parallelism + exactly-once epoch ledger.

Everything here is public-API PySpark (DataFrame / SQL / Structured
Streaming / Arrow pandas UDFs); no custom Catalyst rules.
"""

__version__ = "0.1.0"

from go_tfdata_spark.model import CHANGES_SCHEMA, TRANSCRIPTS_SCHEMA  # noqa: F401
