"""Custom Python DataSource for the synthetic order generator — the
Spark 4 source-extension surface (pyspark.sql.datasource).

The expression-based generator (sources/generator.py) is the fast
path: pure JVM column expressions over ``spark.range``.  This module
re-expresses the SAME deterministic rows as a first-class pluggable
source, because "add a new source format" is part of the engine's
extension story (SURVEY.md §2.1) and the reference's producer is
exactly such a pluggable emitter
(/root/reference/src/producer/kafka_order_producer.py:72-108):

    spark.dataSource.register(OrdersDataSource)
    spark.read.format("kaop_orders").option("n", 1000).load()

Scale/design notes:
- ``partitions()`` splits the id range into ``numPartitions`` chunks —
  executors generate rows in parallel, nothing flows through the
  driver (the contract every distributed source must honor).
- ``read()`` yields ONE pyarrow RecordBatch per partition — the
  vectorized Arrow hand-off, not per-row Python tuples (the same
  batch-not-rows rule as Pandas UDFs).  The md5 draws are a Python
  loop per id and cost ~1 us/row; this source exists for the surface
  and for parity with the column-expression twin, which remains the
  100 TB path (the driver checks both against ONE oracle).
- Rows are bit-identical to ``generator.order_columns``: same salted
  md5 13-hex-digit draws, same floor/index arithmetic, and Spark's
  HALF_UP double rounding replicated via ``decimal.Decimal``
  (Python's builtin round() is half-EVEN and would diverge on .xx5
  boundaries).
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

from .generator import PRODUCT_PRICE_RANGES, PRODUCTS

try:  # pyspark>=4 only; import-gated so the package loads on 3.x
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )
except ImportError:  # pragma: no cover
    DataSource = DataSourceReader = object  # type: ignore[assignment,misc]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]
    InputPartition = None  # type: ignore[assignment]

SCHEMA = "orderId string, product string, price double"


def _unit_hash(i: int, salt: str) -> float:
    """Python twin of generator._unit_hash: first 13 hex digits of
    md5(salt||id) over 16^13 — exact in double (< 2^52)."""
    h = hashlib.md5(f"{salt}{i}".encode()).hexdigest()
    return int(h[:13], 16) / float(16**13)


def order_row(i: int, seed: str = "kaop") -> tuple[str, str, float]:
    """One deterministic order, bit-identical to the column-expression
    generator's (orderId, product, price)."""
    u_prod = _unit_hash(i, seed + ":product")
    u_price = _unit_hash(i, seed + ":price")
    idx = int(u_prod * len(PRODUCTS))  # truncation == Spark int cast
    product = PRODUCTS[idx]
    lo, hi = PRODUCT_PRICE_RANGES[product]
    raw = lo + u_price * (hi - lo)
    # Spark round(x, 2): BigDecimal of the exact double, HALF_UP.
    price = float(Decimal(raw).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
    return (f"ORD-{int(i):04d}", product, price)  # %04d pads, never truncates


class OrdersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.seed = options.get("seed", "kaop")

    def partitions(self):  # executor-parallel id ranges
        step = -(-self.n // self.num_partitions)  # ceil
        return [
            InputPartition((start, min(start + step, self.n)))
            for start in range(0, self.n, step)
        ]

    def read(self, partition):
        import pyarrow as pa

        start, end = partition.value
        rows = [order_row(i, self.seed) for i in range(start, end)]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.string()),
                pa.array([r[1] for r in rows], pa.string()),
                pa.array([r[2] for r in rows], pa.float64()),
            ],
            names=["orderId", "product", "price"],
        )


class OrdersStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin (S3 bounded consumption): the offset IS the next
    order id, so any replayed micro-batch regenerates identical rows —
    deterministic replay is what makes a custom source checkpointable.
    ``n`` bounds the stream (reads past it return no data, so an
    drain terminates); ``rowsPerBatch`` is the per-batch cap, the
    offered-load knob the reference's producer loop exposes as
    messages-per-interval.  Caveat: Python micro-batch sources do not
    support Trigger.AvailableNow (Spark falls back to a single batch)
    — drain with processingTime + processAllAvailable(), as the unit
    test does.

    SCALE CAVEAT — this reader is DRIVER-SIDE by design:
    ``SimpleDataSourceStreamReader.read`` materializes each batch as a
    Python list on the driver, which is fine for a demo-load synthetic
    generator (the reference's producer emits ~2 msg/s from one
    process) but is NOT a pattern to copy for real ingestion — a real
    source must implement the partitioned ``DataSourceStreamReader``
    so executors read, as ``AvroOcfStreamReader``
    (sources/avro_ocf.py) does for landing-directory ingestion.  The
    BATCH reader above already fans out executor-parallel id ranges;
    use it (or the column-expression generator) for any volume run."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.seed = options.get("seed", "kaop")

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        s = start["next"]
        e = min(s + self.rows_per_batch, self.n)
        return iter([order_row(i, self.seed) for i in range(s, e)]), {"next": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [order_row(i, self.seed) for i in range(start["next"], end["next"])]
        )


class OrdersDataSource(DataSource):
    """``spark.read.format("kaop_orders")`` (batch) or
    ``spark.readStream.format("kaop_orders")`` (stream) — options:
    n (rows), numPartitions (batch), rowsPerBatch (stream), seed."""

    @classmethod
    def name(cls) -> str:
        return "kaop_orders"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> OrdersReader:  # noqa: ARG002
        return OrdersReader(self.options)

    def simpleStreamReader(self, schema) -> OrdersStreamReader:  # noqa: ARG002
        return OrdersStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source on a session."""
    spark.dataSource.register(OrdersDataSource)
