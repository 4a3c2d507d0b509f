"""Custom stateful per-key processing: exact per-record emission.

The reference's PriceAggregator emits the *new running average after
every record* (/root/reference/src/aggregator/price_aggregator.py:35-51,
returned per message at avro_order_consumer.py:110-115).  Built-in
update-mode aggregation emits per micro-batch per changed key — the
incremental view of the same semantics (SURVEY.md §7 hard parts).  When
exact per-record emission is required, this module provides the
``applyInPandasWithState`` twin: per-key (count, sum) state carried
across micro-batches, one output row per input record.

Batch twin for verification: operators.windows.running_average (the
AVG OVER ... ROWS UNBOUNDED PRECEDING form).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, seq long, value double, running_count long, running_sum double, running_avg double"
# Running sum carried as integer cents: exact for 2-dp money values, so
# the emitted running_sum/avg equal the decimal-sum oracle bit-for-bit
# (total_cents/100.0 is the nearest double of the exact rational, same
# as CAST(DECIMAL AS DOUBLE)).
STATE_SCHEMA = "count long, sum_cents long"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (count, total_cents) = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values("seq")
        out_rows = []
        for seq, value in zip(pdf["seq"], pdf["value"]):
            count += 1
            total_cents += round(float(value) * 100)
            total = total_cents / 100.0
            out_rows.append((key[0], int(seq), float(value), count, total, total / count))
        yield pd.DataFrame(
            out_rows,
            columns=["key", "seq", "value", "running_count", "running_sum", "running_avg"],
        )
    state.update((count, total_cents))


def running_stats_per_record(keyed_stream: DataFrame) -> DataFrame:
    """Streaming per-record running stats over columns (key, seq, value).

    `seq` orders records within a micro-batch (arrival order across
    batches is the stream order, as in the reference's single consumer).
    """
    return keyed_stream.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
