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
        DataSourceStreamReader,
        InputPartition,
    )
except ImportError:  # pragma: no cover
    DataSource = DataSourceReader = object  # type: ignore[assignment,misc]
    DataSourceStreamReader = object  # type: ignore[assignment,misc]
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


def _id_range_partitions(start: int, end: int, num_partitions: int):
    """Split [start, end) into ceil-sized executor-parallel chunks —
    shared by the batch reader and the stream reader's micro-batches."""
    if end <= start:
        return []
    step = -(-(end - start) // num_partitions)  # ceil
    return [
        InputPartition((s, min(s + step, end))) for s in range(start, end, step)
    ]


def _arrow_batch(start: int, end: int, seed: str):
    """One pyarrow RecordBatch of deterministic orders for an id range
    (executor-side; the vectorized Arrow hand-off, not per-row
    tuples)."""
    import pyarrow as pa

    rows = [order_row(i, seed) for i in range(start, end)]
    return pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.string()),
            pa.array([r[2] for r in rows], pa.float64()),
        ],
        names=["orderId", "product", "price"],
    )


def _opt(options: dict, key: str, default):
    # Python DataSource option keys arrive lowercased; accept both
    return options.get(key.lower(), options.get(key, default))


class OrdersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(_opt(options, "n", 1000))
        self.num_partitions = int(_opt(options, "numPartitions", 8))
        self.seed = _opt(options, "seed", "kaop")

    def partitions(self):  # executor-parallel id ranges
        return _id_range_partitions(0, self.n, self.num_partitions)

    def read(self, partition):
        yield _arrow_batch(*partition.value, self.seed)


class OrdersStreamReader(DataSourceStreamReader):
    """Streaming twin (S3 bounded consumption): the offset IS the next
    order id, so any replayed micro-batch regenerates identical rows —
    deterministic replay is what makes a custom source checkpointable.
    ``n`` bounds the stream (offsets stop advancing at it, so a drain
    terminates); ``rowsPerBatch`` is the per-batch cap, the
    offered-load knob the reference's producer loop exposes as
    messages-per-interval.

    This is the PARTITIONED stream reader: each micro-batch's id range
    splits into ``numPartitions`` executor chunks through the same
    helpers as the batch reader — only offset arithmetic runs on the
    driver, rows are generated executor-side as Arrow batches.
    Restart safety mirrors ``AvroOcfStreamReader``: the engine
    re-plans the checkpointed batch before asking for a new latest
    offset, which re-teaches ``_next``; ``partitions`` raises on a
    backward range as defense in depth."""

    def __init__(self, options: dict):
        self.n = int(_opt(options, "n", 1000))
        self.rows_per_batch = int(_opt(options, "rowsPerBatch", 100))
        self.num_partitions = int(_opt(options, "numPartitions", 4))
        self.seed = _opt(options, "seed", "kaop")
        self._next: int | None = None  # high-watermark this instance knows

    def initialOffset(self) -> dict:
        self._next = 0
        return {"next": 0}

    def latestOffset(self) -> dict:
        if self._next is None:
            # first call of a fresh query (restarts re-plan the
            # checkpointed batch first, teaching partitions/commit)
            self._next = 0
        self._next = min(self._next + self.rows_per_batch, self.n)
        return {"next": self._next}

    def partitions(self, start: dict, end: dict):
        s, e = start["next"], end["next"]
        if e < s:
            raise ValueError(f"kaop_orders stream offset went backwards: {s} -> {e}")
        self._next = max(self._next or 0, e)
        return _id_range_partitions(s, e, self.num_partitions)

    def read(self, partition):  # executor-side generation
        yield _arrow_batch(*partition.value, self.seed)

    def commit(self, end: dict) -> None:
        self._next = max(self._next or 0, end["next"])


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

    def streamReader(self, schema) -> OrdersStreamReader:  # noqa: ARG002
        return OrdersStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source on a session."""
    spark.dataSource.register(OrdersDataSource)
