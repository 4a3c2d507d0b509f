"""kafka_avro_order_processing_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline Nehara831/Kafka-Avro-Order-Processing (a Kafka/Avro
order-event stream processor: validation -> DLQ routing -> per-product
running price aggregates -> error statistics), extended with the
batch/streaming operators a large-scale (100 TB) training-data pipeline
needs: event-time windowing, dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), embedding similarity search, text analysis, and
multimodal-column plumbing.

Design stance (see SURVEY.md §7):
- DataFrame/SQL declarative plans; Catalyst/Tungsten pick the physical
  strategy.  No hand-scheduled RDD code.
- Batch and streaming twins share one expression core.
- Kafka and Avro are optional pluggable edges (the container has no
  spark-kafka/spark-avro jars); every operator has a parquet/JSON path.
- No ``collect()`` inside any operator; everything is expressible as a
  distributed plan that survives a 1000-executor scale-up.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
