"""Stream metrics (SURVEY.md §2.9 T10).

The reference counts processed/failed/retried/DLQ-routed records in
instance attributes printed at shutdown
(/root/reference/src/consumer/avro_order_consumer.py:79-84,210-219).
The Spark-native mapping: ``df.observe()`` attaches named aggregate
metrics to the plan itself (collected per micro-batch with no extra
pass), and a StreamingQueryListener receives them on every progress
event.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from ..operators.validate import validity_predicate


def observe_order_metrics(
    df: DataFrame,
    key: str = "product",
    value: str = "price",
    id_col: str | None = "orderId",
    name: str = "order_metrics",
) -> DataFrame:
    """Attach processed/valid/invalid counters to the plan (A9)."""
    pred = validity_predicate(key, value, id_col)
    return df.observe(
        name,
        F.count(F.lit(1)).alias("records_processed"),
        F.count(F.when(pred, 1)).alias("records_valid"),
        F.count(F.when(~pred | pred.isNull(), 1)).alias("records_invalid"),
    )


@dataclass
class OrderMetricsListener(StreamingQueryListener):
    """Accumulates observed metrics across micro-batches (the
    print_statistics() analogue, queryable at any time)."""

    metric_name: str = "order_metrics"
    totals: dict = field(default_factory=lambda: {
        "records_processed": 0, "records_valid": 0, "records_invalid": 0,
    })

    def onQueryStarted(self, event):  # noqa: N802, ANN001
        pass

    def onQueryProgress(self, event):  # noqa: N802, ANN001
        observed = event.progress.observedMetrics.get(self.metric_name)
        if observed:
            for k in self.totals:
                self.totals[k] += observed[k]

    def onQueryIdle(self, event):  # noqa: N802, ANN001
        pass

    def onQueryTerminated(self, event):  # noqa: N802, ANN001
        pass
