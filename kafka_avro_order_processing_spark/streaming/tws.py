"""transformWithState stateful processors — the Spark 4.x successor to
``applyInPandasWithState`` (SPARK-46815, "Arbitrary State API v2"):
typed per-key state handles (value/list/map), optional TTL, timers, and
schema evolution of state, executed against the RocksDB state store.

The reference's PriceAggregator contract (running per-product stats,
/root/reference/src/aggregator/price_aggregator.py:35-51) is expressed
here as a ``StatefulProcessor`` with a single value-state handle — the
semantics twin of streaming/stateful.running_stats_per_record, on the
newer API.

CONTAINER GATING: transformWithState's Python<->JVM state protocol is
protobuf-framed (pyspark/sql/streaming/proto/StateMessage_pb2), and
this container has NO ``google.protobuf`` module — the state server's
driver worker crashes on import (probed: STREAMING_PYTHON_RUNNER_
INITIALIZATION_FAILURE, "cannot import name 'descriptor' from
'google.protobuf'").  Like the Kafka connector jars, the surface is
fully implemented and the gate is probed at runtime: entry points raise
``TransformWithStateUnavailableError`` with the reason when the
dependency is absent, and the gated test exercises the live path the
moment protobuf appears.  The applyInPandasWithState twin (same
semantics, no protobuf dependency) remains the driver-checked path
(streaming_running_avg_per_record).
"""

from __future__ import annotations

import importlib.util

import pandas as pd
from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

OUTPUT_SCHEMA = (
    "key string, seq long, value double, running_count long,"
    " running_sum double, running_avg double"
)
STATE_SCHEMA = "count long, sum_cents long"


class TransformWithStateUnavailableError(RuntimeError):
    pass


def tws_available() -> bool:
    """True when the transformWithState state protocol can run: the
    worker-side protobuf runtime must import (google.protobuf with its
    C/upb descriptor machinery)."""
    try:
        # find_spec raises (rather than returning None) when the parent
        # "google" namespace package itself is absent.
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _require_tws() -> None:
    if not tws_available():
        raise TransformWithStateUnavailableError(
            "transformWithState requires the google.protobuf package for "
            "its Python<->JVM state protocol (pyspark.sql.streaming.proto); "
            "it is not installed in this environment.  Use the "
            "applyInPandasWithState twin "
            "(streaming.stateful.running_stats_per_record) instead."
        )


def make_running_stats_processor():
    """Build the StatefulProcessor lazily (the class body touches no
    gated import, but construction is kept behind the probe so callers
    fail at the entry point with the clear error, not mid-query)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningStatsProcessor(StatefulProcessor):
        """Per-key (count, integer-cents sum) in a ValueState handle;
        emits one row per input record with the post-record running
        stats — the exact PriceAggregator contract, bit-matching the
        decimal-sum batch oracle (cents/100.0 is the same nearest
        double as CAST(DECIMAL AS DOUBLE))."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("running", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            existing = self._state.get()
            count, total_cents = existing if existing else (0, 0)
            for pdf in rows:
                pdf = pdf.sort_values("seq")
                out = []
                for seq, value in zip(pdf["seq"], pdf["value"]):
                    count += 1
                    total_cents += round(float(value) * 100)
                    total = total_cents / 100.0
                    out.append(
                        (key[0], int(seq), float(value), count, total, total / count)
                    )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "key", "seq", "value",
                        "running_count", "running_sum", "running_avg",
                    ],
                )
            self._state.update((count, total_cents))

        def close(self) -> None:
            pass

    return RunningStatsProcessor()


def running_stats_tws(keyed_stream: DataFrame) -> DataFrame:
    """transformWithState twin of running_stats_per_record over columns
    (key, seq, value).  Requires google.protobuf (probed) and the
    RocksDB state store provider (transformWithState refuses the HDFS
    provider): set spark.sql.streaming.stateStore.providerClass to
    ROCKSDB_PROVIDER before starting the query."""
    _require_tws()
    return keyed_stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=make_running_stats_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
