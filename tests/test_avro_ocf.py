"""Avro Object Container File source (sources/avro_ocf.py): spec
round-trips and the jar-less Spark read path."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest

from kafka_avro_order_processing_spark.sources.avro_ocf import (
    parse_ocf,
    read_avro_ocf,
    write_avro_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "title", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "flags", "type": {"type": "array", "items": "int"}},
        {"name": "ok", "type": "boolean"},
    ],
}

ROWS = [
    {"doc_id": 1, "title": "alpha", "score": 0.5, "lang": "en", "flags": [1, 2, 3], "ok": True},
    {"doc_id": 2, "title": "béta", "score": -1.25, "lang": None, "flags": [], "ok": False},
    {"doc_id": 3, "title": "", "score": 2.0 ** 40, "lang": "fr", "flags": [0], "ok": True},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_round_trip(codec, tmp_path):
    p = str(tmp_path / "docs.avro")
    write_avro_ocf(p, ROWS, SCHEMA, codec=codec)
    schema, records = parse_ocf(open(p, "rb").read())
    assert schema == SCHEMA
    assert records == ROWS


def test_ocf_multi_block(tmp_path):
    p = str(tmp_path / "many.avro")
    rows = [
        {"doc_id": i, "title": f"t{i}", "score": float(i), "lang": None,
         "flags": [i % 3], "ok": bool(i % 2)}
        for i in range(2500)
    ]
    write_avro_ocf(p, rows, SCHEMA, records_per_block=1000)  # 3 blocks
    _, records = parse_ocf(open(p, "rb").read())
    assert records == rows


def test_ocf_rejects_corruption_and_unknown(tmp_path):
    p = str(tmp_path / "x.avro")
    write_avro_ocf(p, ROWS, SCHEMA)
    raw = bytearray(open(p, "rb").read())
    with pytest.raises(ValueError, match="container"):
        parse_ocf(b"PK\x03\x04junk")
    raw[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        parse_ocf(bytes(raw))
    with pytest.raises(ValueError, match="unsupported Avro type"):
        write_avro_ocf(
            p,
            [{"e": "A"}],
            {"type": "record", "name": "R",
             "fields": [{"name": "e", "type": {"type": "interval"}}]},
        )
    with pytest.raises(ValueError, match="named-type reference"):
        write_avro_ocf(
            p,
            [{"e": "A"}],
            {"type": "record", "name": "R",
             "fields": [{"name": "e", "type": "SomeEarlierRecord"}]},
        )


ENUM_MAP_FIXED_SCHEMA = {
    "type": "record",
    "name": "Evt",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "kind", "type": {"type": "enum", "name": "Kind",
                                  "symbols": ["CLICK", "VIEW", "PURCHASE"]}},
        {"name": "counts", "type": {"type": "map", "values": "int"}},
        {"name": "digest", "type": {"type": "fixed", "name": "Md5", "size": 4}},
        {"name": "maybe_kind", "type": ["null", {"type": "enum", "name": "Kind2",
                                                 "symbols": ["A", "B"]}]},
    ],
}

ENUM_MAP_FIXED_ROWS = [
    {"id": 1, "kind": "CLICK", "counts": {"a": 1, "b": 2},
     "digest": b"\x00\x01\x02\x03", "maybe_kind": "B"},
    {"id": 2, "kind": "PURCHASE", "counts": {},
     "digest": b"\xff\xfe\xfd\xfc", "maybe_kind": None},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_enum_map_fixed_round_trip(codec, tmp_path):
    """Avro enums (symbol index), maps (block-counted string-keyed)
    and fixed (raw width bytes) encode+decode per spec."""
    p = str(tmp_path / "emf.avro")
    write_avro_ocf(p, ENUM_MAP_FIXED_ROWS, ENUM_MAP_FIXED_SCHEMA, codec=codec)
    schema, records = parse_ocf(open(p, "rb").read())
    assert schema == ENUM_MAP_FIXED_SCHEMA
    assert records == ENUM_MAP_FIXED_ROWS


def test_enum_map_fixed_invalid_values(tmp_path):
    p = str(tmp_path / "bad.avro")
    bad_sym = [{**ENUM_MAP_FIXED_ROWS[0], "kind": "NOPE"}]
    with pytest.raises(ValueError, match="not in enum"):
        write_avro_ocf(p, bad_sym, ENUM_MAP_FIXED_SCHEMA)
    bad_fixed = [{**ENUM_MAP_FIXED_ROWS[0], "digest": b"\x00"}]
    with pytest.raises(ValueError, match="needs 4 bytes"):
        write_avro_ocf(p, bad_fixed, ENUM_MAP_FIXED_SCHEMA)


def test_spark_reads_enum_map_fixed(spark):
    """Enum -> string, map -> map<string,int>, fixed -> binary through
    the jar-less Spark read path (Arrow-batched mapInPandas)."""
    base = tempfile.mkdtemp(prefix=f"ocfemf_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/p0.avro", ENUM_MAP_FIXED_ROWS, ENUM_MAP_FIXED_SCHEMA)
    df = read_avro_ocf(spark, base)
    assert dict(df.dtypes)["kind"] == "string"
    assert dict(df.dtypes)["counts"] == "map<string,int>"
    assert dict(df.dtypes)["digest"] == "binary"
    got = sorted(
        (r["id"], r["kind"], dict(r["counts"] or {}), bytes(r["digest"]),
         r["maybe_kind"])
        for r in df.collect()
    )
    want = sorted(
        (r["id"], r["kind"], r["counts"], r["digest"], r["maybe_kind"])
        for r in ENUM_MAP_FIXED_ROWS
    )
    assert got == want


def test_logical_types_and_nested_record_round_trip(tmp_path):
    """timestamp-micros/millis and date logical types decode to
    naive-UTC datetimes/dates (and encode back); nested records
    round-trip as dicts."""
    import datetime as dt

    schema = {
        "type": "record", "name": "Evt",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "ts_ms", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "loc", "type": {"type": "record", "name": "Loc",
                                     "fields": [{"name": "lat", "type": "double"},
                                                {"name": "lon", "type": "double"}]}},
        ],
    }
    rows = [
        {"id": 1, "ts": dt.datetime(2024, 3, 1, 12, 30, 15, 123456),
         "ts_ms": dt.datetime(2024, 3, 1, 12, 30, 15, 123000),
         "d": dt.date(2024, 3, 1), "loc": {"lat": 1.5, "lon": -2.25}},
        {"id": 2, "ts": dt.datetime(1969, 12, 31, 23, 59, 59),  # pre-epoch
         "ts_ms": dt.datetime(1970, 1, 1),
         "d": dt.date(1969, 7, 20), "loc": {"lat": 0.0, "lon": 0.0}},
    ]
    p = str(tmp_path / "lt.avro")
    write_avro_ocf(p, rows, schema)
    got_schema, got = parse_ocf(open(p, "rb").read())
    assert got_schema == schema
    assert got == rows


def test_spark_reads_logical_types_and_structs(spark):
    """Logical-type columns land as timestamp_ntz/date, nested records
    as struct columns — through both the mapInPandas path and the
    kaop_avro DataSource."""
    import datetime as dt

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    schema = {
        "type": "record", "name": "Evt",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "loc", "type": {"type": "record", "name": "Loc",
                                     "fields": [{"name": "lat", "type": "double"},
                                                {"name": "lon", "type": "double"}]}},
        ],
    }
    rows = [
        {"id": 1, "ts": dt.datetime(2024, 3, 1, 12, 30, 15, 123456),
         "d": dt.date(2024, 3, 1), "loc": {"lat": 1.5, "lon": -2.25}},
        {"id": 2, "ts": dt.datetime(2023, 11, 5, 1, 30),
         "d": dt.date(2023, 11, 5), "loc": {"lat": 48.85, "lon": 2.35}},
    ]
    base = tempfile.mkdtemp(prefix=f"ocflt_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/p0.avro", rows, schema)

    df = read_avro_ocf(spark, base)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    assert dict(df.dtypes)["d"] == "date"
    assert dict(df.dtypes)["loc"] == "struct<lat:double,lon:double>"
    got = sorted(
        (r["id"], r["ts"], r["d"], r["loc"]["lat"], r["loc"]["lon"])
        for r in df.collect()
    )
    want = sorted(
        (r["id"], r["ts"], r["d"], r["loc"]["lat"], r["loc"]["lon"]) for r in rows
    )
    assert got == want

    register(spark)
    got_ds = sorted(
        (r["id"], r["ts"], r["d"], r["loc"]["lat"], r["loc"]["lon"])
        for r in spark.read.format("kaop_avro").option("path", base).load().collect()
    )
    assert got_ds == want


def test_datasource_writes_timestamps_dates_structs(spark):
    """df.write.format('kaop_avro') now maps timestamp/date columns to
    spec logical types and struct columns to nested records; the full
    round-trip through the container bytes is value-identical."""
    import datetime as dt

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfwl_{uuid.uuid4().hex[:8]}_") + "/out"
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 3, 1, 12, 30, 15, 123456), dt.date(2024, 3, 1),
             (1.5, "a"), {"k1": 2}),
            (2, dt.datetime(2023, 11, 5, 1, 30), dt.date(2023, 11, 5),
             (-0.5, "b"), {}),
        ],
        "id long, ts timestamp_ntz, d date, "
        "loc struct<x: double, tag: string>, m map<string, long>",
    )
    df.write.format("kaop_avro").option("path", base).mode("append").save()
    back = spark.read.format("kaop_avro").option("path", base).load()
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    assert dict(back.dtypes)["loc"] == "struct<x:double,tag:string>"
    got = sorted(
        (r["id"], r["ts"], r["d"], r["loc"]["x"], r["loc"]["tag"],
         dict(r["m"] or {}))
        for r in back.collect()
    )
    want = sorted(
        (r["id"], r["ts"], r["d"], r["loc"]["x"], r["loc"]["tag"],
         dict(r["m"]))
        for r in df.collect()
    )
    assert got == want


def test_decimal_logical_type_round_trip(tmp_path, spark):
    """bytes-backed decimal: big-endian two's-complement unscaled int
    per spec, lands as a Spark decimal(p,s) column, and Spark decimal
    columns write back as the same logical type."""
    import decimal as dec

    schema = {
        "type": "record", "name": "Amt",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                        "precision": 12, "scale": 2}},
        ],
    }
    rows = [
        {"id": 1, "amount": dec.Decimal("12345.67")},
        {"id": 2, "amount": dec.Decimal("-0.05")},
        {"id": 3, "amount": dec.Decimal("0.00")},
    ]
    p = str(tmp_path / "amt.avro")
    write_avro_ocf(p, rows, schema)
    _, got = parse_ocf(open(p, "rb").read())
    assert got == rows

    base = tempfile.mkdtemp(prefix=f"ocfdec_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/a.avro", rows, schema)
    df = read_avro_ocf(spark, base)
    assert dict(df.dtypes)["amount"] == "decimal(12,2)"
    assert sorted((r["id"], r["amount"]) for r in df.collect()) == [
        (1, dec.Decimal("12345.67")), (2, dec.Decimal("-0.05")),
        (3, dec.Decimal("0.00"))]

    # Spark decimal column -> kaop_avro write -> read back
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    out = tempfile.mkdtemp(prefix=f"ocfdecw_{uuid.uuid4().hex[:8]}_") + "/o"
    sdf = spark.createDataFrame(
        [(1, dec.Decimal("99.99")), (2, dec.Decimal("-1.50"))],
        "id long, v decimal(10,2)",
    )
    sdf.write.format("kaop_avro").option("path", out).mode("append").save()
    back = spark.read.format("kaop_avro").option("path", out).load()
    assert dict(back.dtypes)["v"] == "decimal(10,2)"
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, dec.Decimal("99.99")), (2, dec.Decimal("-1.50"))]


def test_named_type_reference_reuse_and_recursion(tmp_path, spark):
    """A named record/enum defined once may be referenced again by
    name (spec define-before-use); a RECURSIVE schema round-trips
    through the codec (lazy named-type resolution)."""
    schema = {
        "type": "record", "name": "Trip",
        "fields": [
            {"name": "src", "type": {"type": "record", "name": "Loc",
                                     "fields": [{"name": "lat", "type": "double"},
                                                {"name": "lon", "type": "double"}]}},
            {"name": "dst", "type": "Loc"},  # reference by name
            {"name": "tags", "type": {"type": "array", "items": "Loc"}},
        ],
    }
    rows = [
        {"src": {"lat": 1.0, "lon": 2.0}, "dst": {"lat": 3.0, "lon": 4.0},
         "tags": [{"lat": 5.0, "lon": 6.0}]},
    ]
    p = str(tmp_path / "trip.avro")
    write_avro_ocf(p, rows, schema)
    got_schema, got = parse_ocf(open(p, "rb").read())
    assert got_schema == schema and got == rows

    base = tempfile.mkdtemp(prefix=f"ocfref_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/t.avro", rows, schema)
    df = read_avro_ocf(spark, base)
    assert dict(df.dtypes)["dst"] == "struct<lat:double,lon:double>"
    r = df.collect()[0]
    assert (r["dst"]["lat"], r["tags"][0]["lon"]) == (3.0, 6.0)

    recursive = {
        "type": "record", "name": "Node",
        "fields": [{"name": "v", "type": "long"},
                   {"name": "next", "type": ["null", "Node"]}],
    }
    chain = {"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}
    write_avro_ocf(p, [chain, {"v": 9, "next": None}], recursive)
    _, got_rec = parse_ocf(open(p, "rb").read())
    assert got_rec == [chain, {"v": 9, "next": None}]


def test_resolution_field_aliases():
    """A reader field renames a writer field by listing the old name
    in its aliases — spec field-alias matching."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    w = {"type": "record", "name": "R",
         "fields": [{"name": "old_score", "type": "int"}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "score", "type": "long",
                     "aliases": ["ancient_score", "old_score"]}]}
    assert resolve_record({"old_score": 7}, w, r) == {"score": 7}


def test_resolution_validates_nullable_unions():
    """ADVICE fix: ['null', T] fields unwrap before the promotion
    check — nullable int promotes to nullable long (null passes), and
    a writer string under reader ['null','long'] is an ERROR, not a
    silent pass-through."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    w = {"type": "record", "name": "R",
         "fields": [{"name": "v", "type": ["null", "int"]}]}
    r_ok = {"type": "record", "name": "R",
            "fields": [{"name": "v", "type": ["null", "long"]}]}
    assert resolve_record({"v": 7}, w, r_ok) == {"v": 7}
    assert resolve_record({"v": None}, w, r_ok) == {"v": None}

    w_str = {"type": "record", "name": "R",
             "fields": [{"name": "v", "type": "string"}]}
    with pytest.raises(ValueError, match="illegal promotion"):
        resolve_record({"v": "oops"}, w_str, r_ok)


def test_spark_reads_ocf_directory(spark):
    """binaryFile + mapInPandas read: two files, deflate, nullable and
    array columns land as proper Spark types."""
    base = tempfile.mkdtemp(prefix=f"ocf_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/part-0.avro", ROWS[:2], SCHEMA, codec="deflate")
    write_avro_ocf(f"{base}/part-1.avro", ROWS[2:], SCHEMA, codec="deflate")
    df = read_avro_ocf(spark, base)
    assert dict(df.dtypes)["flags"] == "array<int>"
    got = sorted(
        (r["doc_id"], r["title"], r["score"], r["lang"], list(r["flags"]), r["ok"])
        for r in df.collect()
    )
    want = sorted(
        (r["doc_id"], r["title"], r["score"], r["lang"], r["flags"], r["ok"])
        for r in ROWS
    )
    assert got == want


def test_spark_read_schema_drift_fails(spark):
    base = tempfile.mkdtemp(prefix=f"ocf_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/a.avro", ROWS[:1], SCHEMA)
    other = {**SCHEMA, "fields": SCHEMA["fields"][:-1]}
    write_avro_ocf(f"{base}/b.avro", [{k: v for k, v in ROWS[0].items() if k != "ok"}], other)
    with pytest.raises(Exception, match="drift|Py4J"):
        read_avro_ocf(spark, base).collect()


def test_order_records_through_ocf(spark):
    """The reference's order record shape through the container format:
    generator rows written as .avro, read back identically."""
    from kafka_avro_order_processing_spark.sources.generator import gen_orders

    order_schema = {
        "type": "record",
        "name": "Order",
        "fields": [
            {"name": "orderId", "type": "string"},
            {"name": "product", "type": "string"},
            {"name": "price", "type": "double"},
        ],
    }
    orders = [
        {"orderId": r["orderId"], "product": r["product"], "price": r["price"]}
        for r in gen_orders(spark, 50).select("orderId", "product", "price").collect()
    ]
    base = tempfile.mkdtemp(prefix=f"ocf_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/orders.avro", orders, order_schema)
    got = sorted(tuple(r) for r in read_avro_ocf(spark, base).collect())
    assert got == sorted((o["orderId"], o["product"], o["price"]) for o in orders)


def test_datasource_batch_matches_mapinpandas_path(spark):
    """format('kaop_avro') batch read == read_avro_ocf over the same
    directory (one partition per file)."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfds_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/p0.avro", ROWS[:2], SCHEMA)
    write_avro_ocf(f"{base}/p1.avro", ROWS[2:], SCHEMA)
    register(spark)
    via_ds = sorted(
        (r["doc_id"], r["title"], r["lang"], list(r["flags"]))
        for r in spark.read.format("kaop_avro").option("path", base).load().collect()
    )
    via_map = sorted(
        (r["doc_id"], r["title"], r["lang"], list(r["flags"]))
        for r in read_avro_ocf(spark, base).collect()
    )
    assert via_ds == via_map and len(via_ds) == 3


def test_datasource_streams_growing_landing_dir(spark):
    """readStream over a landing dir: files visible at start ingest in
    batch one; a file landing later ingests on the next trigger —
    consumed-name-set offsets, no reprocessing."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfstream_{uuid.uuid4().hex[:8]}_")
    land, sink, chk = f"{base}/land", f"{base}/sink", f"{base}/chk"
    write_avro_ocf(f"{land}/part-0001.avro", ROWS[:2], SCHEMA)
    register(spark)
    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert {r["doc_id"] for r in spark.read.parquet(sink).collect()} == {1, 2}
        write_avro_ocf(f"{land}/part-0002.avro", ROWS[2:], SCHEMA)
        q.processAllAvailable()
        assert {r["doc_id"] for r in spark.read.parquet(sink).collect()} == {1, 2, 3}
        assert spark.read.parquet(sink).count() == 3  # no reprocessing
    finally:
        q.stop()


def test_datasource_stream_read_is_partitioned(spark):
    """The stream reader must decode on EXECUTORS, one task per landed
    file — three files in one micro-batch arrive as three distinct
    input partitions (the old SimpleDataSourceStreamReader funneled
    every record through a driver-side list)."""
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfpart_{uuid.uuid4().hex[:8]}_")
    land, chk = f"{base}/land", f"{base}/chk"
    for i, row in enumerate(ROWS):
        write_avro_ocf(f"{land}/part-{i:04d}.avro", [row], SCHEMA)
    register(spark)
    seen = {"pids": set(), "rows": 0}

    def body(df, _eid):
        pids = [r[0] for r in df.select(F.spark_partition_id()).collect()]
        seen["pids"].update(pids)
        seen["rows"] += len(pids)

    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .load()
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen["rows"] == len(ROWS)
    assert len(seen["pids"]) == len(ROWS)  # one input partition per file


def test_schema_resolution_across_evolved_files(spark):
    """The lake-evolution story: v1 files (no 'ok', int doc_id) and v2
    files (full schema) read as ONE table under a reader schema —
    defaults fill, int promotes to long, dropped fields vanish."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    v1 = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "doc_id", "type": "int"},
            {"name": "title", "type": "string"},
            {"name": "legacy", "type": "string"},  # dropped by the reader
        ],
    }
    reader = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "title", "type": "string"},
            {"name": "ok", "type": "boolean", "default": False},
        ],
    }
    v2 = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "title", "type": "string"},
            {"name": "ok", "type": "boolean"},
        ],
    }
    base = tempfile.mkdtemp(prefix=f"ocfevo_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/v1.avro", [{"doc_id": 1, "title": "old", "legacy": "x"}], v1)
    write_avro_ocf(f"{base}/v2.avro", [{"doc_id": 2, "title": "new", "ok": True}], v2)

    got = sorted(
        (r["doc_id"], r["title"], r["ok"])
        for r in read_avro_ocf(spark, base, reader_schema=reader).collect()
    )
    assert got == [(1, "old", False), (2, "new", True)]

    # missing default is an error, not a null
    with pytest.raises(ValueError, match="no default"):
        resolve_record({"doc_id": 1, "title": "t", "legacy": "x"}, v1, v2)
    # illegal promotion is an error
    bad = {**reader, "fields": [{"name": "doc_id", "type": "int"},
                                 {"name": "title", "type": "string"},
                                 {"name": "ok", "type": "boolean", "default": False}]}
    with pytest.raises(ValueError, match="promotion"):
        resolve_record({"doc_id": 2, "title": "n", "ok": True}, v2, bad)


def test_datasource_write_then_read_round_trip(spark):
    """df.write.format('kaop_avro') -> .avro parts -> read back equal.
    Covers nullable union columns and the empty-partition no-file
    case."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfw_{uuid.uuid4().hex[:8]}_") + "/out"
    df = spark.createDataFrame(
        [(1, "a", 1.5, None), (2, "b", -2.0, "en"), (3, "c", 0.0, "fr")],
        "doc_id long, title string, score double, lang string",
    ).repartition(8)  # more partitions than rows -> empty partitions
    df.write.format("kaop_avro").option("path", base).mode("append").save()
    got = sorted(tuple(r) for r in
                 spark.read.format("kaop_avro").option("path", base).load().collect())
    assert got == [(1, "a", 1.5, None), (2, "b", -2.0, "en"), (3, "c", 0.0, "fr")]
    import glob
    parts = glob.glob(f"{base}/part-*.avro")
    assert 1 <= len(parts) <= 3  # empty partitions wrote no files
    assert not glob.glob(f"{base}/_tmp_*.avro")  # temps all renamed


def test_datasource_two_appends_keep_both_writes(spark):
    """Two successive mode('append') saves into one directory must not
    collide on part names: the commit's per-job uuid keeps every part,
    so the second append never silently replaces the first's files."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfw3_{uuid.uuid4().hex[:8]}_") + "/out"
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    b = spark.createDataFrame([(3, "z")], "k long, s string")
    a.write.format("kaop_avro").option("path", base).mode("append").save()
    import glob
    n_first = len(glob.glob(f"{base}/part-*.avro"))
    b.write.format("kaop_avro").option("path", base).mode("append").save()
    got = sorted(tuple(r) for r in
                 spark.read.format("kaop_avro").option("path", base).load().collect())
    assert got == [(1, "x"), (2, "y"), (3, "z")]
    assert len(glob.glob(f"{base}/part-*.avro")) > n_first  # nothing replaced


def test_datasource_write_overwrite_replaces_parts(spark):
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfw2_{uuid.uuid4().hex[:8]}_") + "/out"
    a = spark.createDataFrame([(1, "x")], "k long, s string")
    b = spark.createDataFrame([(2, "y")], "k long, s string")
    a.write.format("kaop_avro").option("path", base).mode("append").save()
    b.write.format("kaop_avro").option("path", base).mode("overwrite").save()
    got = [tuple(r) for r in
           spark.read.format("kaop_avro").option("path", base).load().collect()]
    assert got == [(2, "y")]


def test_datasource_reader_schema_and_codec_options(spark):
    """format('kaop_avro') depth: .option('readerSchema', json) reads
    EVOLVED files as one table through per-file resolution, and
    .option('codec','deflate') writes spec-compliant deflate blocks
    that round-trip."""
    import json as _json

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfopt_{uuid.uuid4().hex[:8]}_")

    # deflate write -> read back
    df = spark.createDataFrame([(1, "a" * 500), (2, "b" * 500)], "k long, s string")
    df.write.format("kaop_avro").option("path", f"{base}/defl") \
        .option("codec", "deflate").mode("append").save()
    import glob
    part = glob.glob(f"{base}/defl/part-*.avro")[0]
    _, recs = parse_ocf(open(part, "rb").read())  # codec honored on disk
    got = sorted(tuple(r) for r in spark.read.format("kaop_avro")
                 .option("path", f"{base}/defl").load().collect())
    assert got == [(1, "a" * 500), (2, "b" * 500)]

    # evolved files under a reader schema, through the format() path
    v1 = {"type": "record", "name": "Doc",
          "fields": [{"name": "doc_id", "type": "int"},
                     {"name": "title", "type": "string"}]}
    v2 = {"type": "record", "name": "Doc",
          "fields": [{"name": "doc_id", "type": "long"},
                     {"name": "title", "type": "string"},
                     {"name": "ok", "type": "boolean"}]}
    reader = {"type": "record", "name": "Doc",
              "fields": [{"name": "doc_id", "type": "long"},
                         {"name": "title", "type": "string"},
                         {"name": "ok", "type": "boolean", "default": False}]}
    evo = f"{base}/evo"
    write_avro_ocf(f"{evo}/v1.avro", [{"doc_id": 1, "title": "old"}], v1)
    write_avro_ocf(f"{evo}/v2.avro", [{"doc_id": 2, "title": "new", "ok": True}], v2)
    got = sorted(
        (r["doc_id"], r["title"], r["ok"])
        for r in spark.read.format("kaop_avro").option("path", evo)
        .option("readerSchema", _json.dumps(reader)).load().collect()
    )
    assert got == [(1, "old", False), (2, "new", True)]



def test_datasource_reads_file_uri(spark):
    """Listing and per-file reads route through pyarrow's filesystem
    for URI paths — the source is not local-glob-only."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfuri_{uuid.uuid4().hex[:8]}_")
    write_avro_ocf(f"{base}/p0.avro", ROWS[:2], SCHEMA)
    write_avro_ocf(f"{base}/p1.avro", ROWS[2:], SCHEMA)
    got = sorted(
        r["doc_id"]
        for r in spark.read.format("kaop_avro")
        .option("path", f"file://{base}").load().collect()
    )
    assert got == [1, 2, 3]


def test_datasource_stream_read_with_reader_schema(spark):
    """Streaming ingestion of a landing dir whose files EVOLVE between
    epochs: with .option('readerSchema', ...) each file resolves
    per-epoch (defaults fill, promotions apply) — the schema-drift
    error path is for un-resolved reads only."""
    import json as _json

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    v1 = {"type": "record", "name": "Doc",
          "fields": [{"name": "doc_id", "type": "int"},
                     {"name": "title", "type": "string"}]}
    v2 = {"type": "record", "name": "Doc",
          "fields": [{"name": "doc_id", "type": "long"},
                     {"name": "title", "type": "string"},
                     {"name": "ok", "type": "boolean"}]}
    reader = {"type": "record", "name": "Doc",
              "fields": [{"name": "doc_id", "type": "long"},
                         {"name": "title", "type": "string"},
                         {"name": "ok", "type": "boolean", "default": False}]}
    base = tempfile.mkdtemp(prefix=f"ocfsrs_{uuid.uuid4().hex[:8]}_")
    land, sink, chk = f"{base}/land", f"{base}/sink", f"{base}/chk"
    write_avro_ocf(f"{land}/part-0001.avro", [{"doc_id": 1, "title": "old"}], v1)
    register(spark)
    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .option("readerSchema", _json.dumps(reader))
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        write_avro_ocf(f"{land}/part-0002.avro",
                       [{"doc_id": 2, "title": "new", "ok": True}], v2)
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["doc_id"], r["title"], r["ok"])
        for r in spark.read.parquet(sink).collect()
    )
    assert got == [(1, "old", False), (2, "new", True)]


def test_uri_write_manifest_commit(spark):
    """URI (object-store-shaped) writes: final-named parts published
    by a _manifest.json PUT — two appends accumulate, overwrite
    replaces, externally-produced parts fold into the first seed, and
    readers never see the raw listing of a manifest-managed dir."""
    import json as _json

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfuriw_{uuid.uuid4().hex[:8]}_")
    out, uri = f"{base}/out", f"file://{base}/out"

    # an externally-produced part, written before our writer ever ran
    # (same shape the writer emits: Spark columns are nullable unions)
    nullable_schema = {
        "type": "record", "name": "SparkRecord",
        "fields": [
            {"name": "doc_id", "type": ["null", "long"]},
            {"name": "title", "type": ["null", "string"]},
            {"name": "score", "type": ["null", "double"]},
            {"name": "lang", "type": ["null", "string"]},
            {"name": "flags",
             "type": ["null", {"type": "array", "items": ["null", "int"]}]},
            {"name": "ok", "type": ["null", "boolean"]},
        ],
    }
    write_avro_ocf(f"{out}/external.avro", [ROWS[0]], nullable_schema)

    df1 = spark.createDataFrame([(10, "t", 0.5, None, [1], True)],
                                "doc_id long, title string, score double,"
                                " lang string, flags array<int>, ok boolean")
    df2 = spark.createDataFrame([(11, "u", 1.5, "en", [], False)],
                                df1.schema)
    df1.write.format("kaop_avro").option("path", uri).mode("append").save()
    m = _json.loads(open(f"{out}/_manifest.json").read())
    assert "external.avro" in m["parts"] and len(m["parts"]) == 2

    df2.write.format("kaop_avro").option("path", uri).mode("append").save()
    got = sorted(r["doc_id"] for r in spark.read.format("kaop_avro")
                 .option("path", uri).load().collect())
    assert got == [1, 10, 11]

    # a stray uncommitted part in the dir must stay invisible
    write_avro_ocf(f"{base}/stray.avro", [ROWS[1]], SCHEMA)
    import shutil
    shutil.copy(f"{base}/stray.avro", f"{out}/part-stray.avro")
    got = sorted(r["doc_id"] for r in spark.read.format("kaop_avro")
                 .option("path", uri).load().collect())
    assert got == [1, 10, 11]  # manifest, not listing

    df1.write.format("kaop_avro").option("path", uri).mode("overwrite").save()
    got = [r["doc_id"] for r in spark.read.format("kaop_avro")
           .option("path", uri).load().collect()]
    assert got == [10]
    m = _json.loads(open(f"{out}/_manifest.json").read())
    assert len(m["parts"]) == 1
    import glob
    assert not glob.glob(f"{out}/external.avro")  # replaced set deleted


def test_uri_stream_write_epoch_manifest(spark):
    """writeStream to a URI path: each epoch's parts swap into the
    manifest under the epochs map — two drains accumulate, and the
    committed set reads back exactly."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfurisw_{uuid.uuid4().hex[:8]}_")
    src, chk = f"{base}/src", f"{base}/chk"
    uri = f"file://{base}/out"

    def drain(rows):
        spark.createDataFrame(rows, "k long, s string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema("k long, s string")
            .parquet(src)
            .writeStream.format("kaop_avro")
            .option("path", uri)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain([(1, "a"), (2, "b")])
    drain([(3, "c")])
    got = sorted(tuple(r) for r in spark.read.format("kaop_avro")
                 .option("path", uri).load().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    import json as _json
    m = _json.loads(open(f"{base}/out/_manifest.json").read())
    assert len(m["epochs"]) >= 2  # distinct epochs tracked


def test_datasource_stream_write_commits_epoch_parts(spark):
    """writeStream.format('kaop_avro'): a parquet-staged stream lands
    as batch-stamped .avro parts; total content equals the input and a
    second drain (new epoch) appends without touching old parts."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfsw_{uuid.uuid4().hex[:8]}_")
    src, out, chk = f"{base}/src", f"{base}/out", f"{base}/chk"

    def drain(rows):
        spark.createDataFrame(rows, "k long, s string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema("k long, s string")
            .parquet(src)
            .writeStream.format("kaop_avro")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain([(1, "a"), (2, "b")])
    first = sorted(
        tuple(r)
        for r in spark.read.format("kaop_avro").option("path", out).load().collect()
    )
    assert first == [(1, "a"), (2, "b")]
    drain([(3, "c")])
    both = sorted(
        tuple(r)
        for r in spark.read.format("kaop_avro").option("path", out).load().collect()
    )
    assert both == [(1, "a"), (2, "b"), (3, "c")]
    import glob
    names = sorted(glob.glob(f"{out}/part-*.avro"))
    assert len(names) >= 2  # distinct epochs -> distinct batch stamps


# ---------------------------------------------------------------------------
# round 6: general union re-resolution, strict manifest reads,
# manifest-aware batch listing, concurrent-writer publish safety,
# name-set stream offsets + maxFilesPerBatch
# ---------------------------------------------------------------------------


def test_union_re_resolution_subset_superset_reorder():
    """Spec Schema Resolution for unions with DIFFERENT branch sets:
    the datum re-matches to its writer branch, then resolves against
    the first compatible reader branch — superset, subset (error only
    for a datum on a dropped branch), and reordered unions all work."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    def rec(t):
        return {"type": "record", "name": "R",
                "fields": [{"name": "v", "type": t}]}

    # superset: reader adds a branch
    w, r = rec(["null", "int"]), rec(["null", "int", "string"])
    assert resolve_record({"v": 5}, w, r) == {"v": 5}
    assert resolve_record({"v": None}, w, r) == {"v": None}
    # subset: datum on a surviving branch resolves (with promotion),
    # datum on the dropped branch errors
    w2, r2 = rec(["null", "int", "string"]), rec(["null", "long"])
    assert resolve_record({"v": 5}, w2, r2) == {"v": 5}
    assert resolve_record({"v": None}, w2, r2) == {"v": None}
    with pytest.raises(ValueError, match="illegal promotion"):
        resolve_record({"v": "oops"}, w2, r2)
    # reorder + promotion
    w3, r3 = rec(["int", "null"]), rec(["null", "double"])
    assert resolve_record({"v": 7}, w3, r3) == {"v": 7.0}
    # non-union writer into a multi-branch reader union
    w4, r4 = rec("string"), rec(["int", "string", "null"])
    assert resolve_record({"v": "hi"}, w4, r4) == {"v": "hi"}


def test_union_resolution_recurses_into_records_and_arrays():
    """Union re-resolution composes with nested evolution: a record
    branch resolves field-by-field (defaults fill), array items
    promote element-wise."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    w_inner = {"type": "record", "name": "P",
               "fields": [{"name": "x", "type": "int"}]}
    r_inner = {"type": "record", "name": "P",
               "fields": [{"name": "x", "type": "long"},
                          {"name": "tag", "type": "string", "default": "t"}]}
    w = {"type": "record", "name": "R",
         "fields": [{"name": "p", "type": ["null", w_inner]},
                    {"name": "xs", "type": {"type": "array", "items": "int"}}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "p", "type": ["null", r_inner]},
                    {"name": "xs", "type": {"type": "array", "items": "double"}}]}
    got = resolve_record({"p": {"x": 3}, "xs": [1, 2]}, w, r)
    assert got == {"p": {"x": 3, "tag": "t"}, "xs": [1.0, 2.0]}
    assert resolve_record({"p": None, "xs": []}, w, r) == {"p": None, "xs": []}


def test_string_bytes_promotion_and_enum_default():
    """The remaining spec promotions: string<->bytes both ways; an
    enum symbol the reader dropped falls to the reader's default
    symbol, and errors without one."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    w = {"type": "record", "name": "R",
         "fields": [{"name": "s", "type": "string"},
                    {"name": "b", "type": "bytes"}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "s", "type": "bytes"},
                    {"name": "b", "type": "string"}]}
    assert resolve_record({"s": "héllo", "b": "héllo".encode()}, w, r) == {
        "s": "héllo".encode(), "b": "héllo"}

    we = {"type": "record", "name": "R",
          "fields": [{"name": "c", "type": {
              "type": "enum", "name": "E", "symbols": ["OLD", "A"]}}]}
    re_def = {"type": "record", "name": "R",
              "fields": [{"name": "c", "type": {
                  "type": "enum", "name": "E", "symbols": ["A", "B"],
                  "default": "A"}}]}
    re_nodef = {"type": "record", "name": "R",
                "fields": [{"name": "c", "type": {
                    "type": "enum", "name": "E", "symbols": ["A", "B"]}}]}
    assert resolve_record({"c": "OLD"}, we, re_def) == {"c": "A"}
    assert resolve_record({"c": "A"}, we, re_nodef) == {"c": "A"}
    with pytest.raises(ValueError, match="enum symbol"):
        resolve_record({"c": "OLD"}, we, re_nodef)


def test_null_into_non_nullable_reader_errors():
    """ADVICE fix: a null from a nullable writer field must ERROR
    against a reader type with no null branch — never pass silently
    into a non-nullable column."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    w = {"type": "record", "name": "R",
         "fields": [{"name": "v", "type": ["null", "int"]}]}
    r_bare = {"type": "record", "name": "R",
              "fields": [{"name": "v", "type": "int"}]}
    r_union = {"type": "record", "name": "R",
               "fields": [{"name": "v", "type": ["int", "string"]}]}
    assert resolve_record({"v": 7}, w, r_bare) == {"v": 7}
    with pytest.raises(ValueError, match="null"):
        resolve_record({"v": None}, w, r_bare)
    with pytest.raises(ValueError, match="null"):
        resolve_record({"v": None}, w, r_union)


def test_read_manifest_strict_errors(tmp_path):
    """ADVICE fix: _read_manifest returns None ONLY for a genuinely
    absent manifest; corrupt content raises instead of silently
    falling back to the raw listing (which would expose uncommitted
    parts)."""
    import json as _json

    from kafka_avro_order_processing_spark.sources.avro_ocf import _read_manifest

    d = str(tmp_path / "lake")
    import os as _os

    _os.makedirs(d)
    assert _read_manifest(d) is None               # absent, local
    assert _read_manifest(f"file://{d}") is None   # absent, URI
    with open(f"{d}/_manifest.json", "w") as f:
        f.write("{not json")
    with pytest.raises(_json.JSONDecodeError):
        _read_manifest(d)
    with pytest.raises(_json.JSONDecodeError):
        _read_manifest(f"file://{d}")


def test_read_avro_ocf_honors_manifest(spark, tmp_path):
    """ADVICE fix: the mapInPandas batch path lists through the same
    manifest-aware filter as the kaop_avro reader — an uncommitted
    final-named part in a manifest-managed directory is invisible to
    BOTH, and the two paths agree."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    uri = f"file://{tmp_path}/lake"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    df.write.format("kaop_avro").option("path", uri).mode("append").save()
    # a final-named part that no commit published (simulated abort)
    write_avro_ocf(
        f"{uri}/part-deadbeef-zz.avro",
        [{"k": None, "s": None}],
        {"type": "record", "name": "SparkRecord",
         "fields": [{"name": "k", "type": ["null", "long"]},
                    {"name": "s", "type": ["null", "string"]}]},
    )
    via_mip = sorted(tuple(r) for r in read_avro_ocf(spark, uri).collect())
    via_ds = sorted(
        tuple(r)
        for r in spark.read.format("kaop_avro").option("path", uri).load().collect()
    )
    assert via_mip == via_ds == [(1, "a"), (2, "b")]


def test_manifest_publish_detects_lost_race(tmp_path, monkeypatch):
    """Concurrent-writer safety: if another writer's manifest PUT
    lands after ours (last-writer-wins race), the read-back check
    catches it and the retry merges against the adversary's state —
    no part loss."""
    from kafka_avro_order_processing_spark.sources import avro_ocf as mod

    uri = f"file://{tmp_path}/lake"
    import pyarrow.fs as pafs

    fs, rel = pafs.FileSystem.from_uri(uri)
    fs.create_dir(rel, recursive=True)
    real_write = mod._write_manifest
    state = {"raced": False}

    def racing_write(path, manifest):
        real_write(path, manifest)
        if not state["raced"]:  # adversary's PUT lands right after ours
            state["raced"] = True
            real_write(path, {"parts": ["part-advers-1.avro"], "version": 99,
                              "writer": "adversary"})

    monkeypatch.setattr(mod, "_write_manifest", racing_write)
    out = mod._publish_manifest(
        uri, lambda cur: {**cur, "parts": sorted(set(cur.get("parts", []))
                                                 | {"part-mine-1.avro"})}
    )
    assert state["raced"]
    assert set(out["parts"]) == {"part-advers-1.avro", "part-mine-1.avro"}
    assert mod._read_manifest(uri)["parts"] == sorted(out["parts"])


def test_concurrent_append_writers_keep_all_parts(spark, tmp_path):
    """Two interleaved append jobs into one URI directory: writer A
    writes, writer B writes and commits, then A commits — A's publish
    folds B's committed parts in (mutation computed against the
    CURRENT manifest), so nothing is lost."""
    from pyspark.sql import Row

    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        AvroOcfWriter,
        register,
    )

    register(spark)
    uri = f"file://{tmp_path}/lake"
    import pyarrow.fs as pafs

    fs, rel = pafs.FileSystem.from_uri(uri)
    fs.create_dir(rel, recursive=True)
    avsc = {"type": "record", "name": "SparkRecord",
            "fields": [{"name": "k", "type": "long"},
                       {"name": "s", "type": "string"}]}
    wa = AvroOcfWriter(uri, avsc, ["k", "s"], overwrite=False)
    wb = AvroOcfWriter(uri, avsc, ["k", "s"], overwrite=False)
    ma = wa.write(iter([Row(k=1, s="a")]))
    mb = wb.write(iter([Row(k=2, s="b")]))
    wb.commit([mb])
    wa.commit([ma])
    got = sorted(
        tuple(r)
        for r in spark.read.format("kaop_avro").option("path", uri).load().collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_stream_reader_ingests_out_of_order_names(spark):
    """ADVICE fix: name-SET offsets — a newly landed file whose name
    sorts BEFORE already-consumed names (uuid part names are
    non-monotonic) is still ingested exactly once, with no re-read of
    old files."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfooo_{uuid.uuid4().hex[:8]}_")
    land, sink, chk = f"{base}/land", f"{base}/sink", f"{base}/chk"
    write_avro_ocf(f"{land}/part-zz.avro", ROWS[:2], SCHEMA)
    register(spark)
    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert {r["doc_id"] for r in spark.read.parquet(sink).collect()} == {1, 2}
        # sorts before the consumed part-zz name
        write_avro_ocf(f"{land}/part-aa.avro", ROWS[2:], SCHEMA)
        q.processAllAvailable()
        got = [r["doc_id"] for r in spark.read.parquet(sink).collect()]
        assert sorted(got) == [1, 2, 3]  # ingested once, nothing re-read
    finally:
        q.stop()


def test_stream_reader_max_files_per_batch(spark):
    """maxFilesPerBatch: a 5-file backlog on a FRESH query drains in
    ceil(5/2)=3 capped micro-batches, every row exactly once."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfcap_{uuid.uuid4().hex[:8]}_")
    land, chk = f"{base}/land", f"{base}/chk"
    for i in range(5):
        write_avro_ocf(
            f"{land}/part-{i:04d}.avro",
            [{**ROWS[0], "doc_id": 100 + i}],
            SCHEMA,
        )
    register(spark)
    batches: list[list[int]] = []

    def body(df, _eid):
        ids = [r["doc_id"] for r in df.collect()]
        if ids:
            batches.append(sorted(ids))

    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .option("maxFilesPerBatch", "2")
        .load()
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(x for b in batches for x in b) == [100, 101, 102, 103, 104]
    assert all(len(b) <= 2 for b in batches)  # cap honored per batch
    assert len(batches) >= 3  # ceil(5/2)


def test_stream_reader_restart_no_rewind_no_skip(spark):
    """Checkpoint restart with a cap configured: the consumed set
    restores from the checkpointed name-set offset — nothing already
    ingested re-reads (no rewind), every new file lands exactly once
    (no skip)."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfrst_{uuid.uuid4().hex[:8]}_")
    land, sink, chk = f"{base}/land", f"{base}/sink", f"{base}/chk"
    register(spark)

    def run_query(cap=None):
        reader = (
            spark.readStream.format("kaop_avro").option("path", land)
        )
        if cap is not None:
            reader = reader.option("maxFilesPerBatch", str(cap))
        return (
            reader.load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(processingTime="0 seconds")
            .start()
        )

    write_avro_ocf(f"{land}/part-a.avro", [{**ROWS[0], "doc_id": 1}], SCHEMA)
    write_avro_ocf(f"{land}/part-b.avro", [{**ROWS[0], "doc_id": 2}], SCHEMA)
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(sink).collect()
    ) == [1, 2]
    write_avro_ocf(f"{land}/part-c.avro", [{**ROWS[0], "doc_id": 3}], SCHEMA)
    write_avro_ocf(f"{land}/part-d.avro", [{**ROWS[0], "doc_id": 4}], SCHEMA)
    q = run_query(cap=1)  # restarted instance, same checkpoint
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3, 4]  # no rewind (1,2 once), no skip (3,4 land)


def test_stream_clean_source_delete_bounds_state(spark):
    """cleanSource=delete: a committed batch's files retire from the
    landing dir when the engine delivers the commit (after the NEXT
    batch completes — same trailing-batch semantics as Spark's own
    file source), and retired names prune out of subsequent
    checkpoint offsets (bounded state)."""
    import glob
    import json as _json

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfclean_{uuid.uuid4().hex[:8]}_")
    land, sink, chk = f"{base}/land", f"{base}/sink", f"{base}/chk"
    register(spark)
    write_avro_ocf(f"{land}/part-a.avro", [{**ROWS[0], "doc_id": 1}], SCHEMA)
    write_avro_ocf(f"{land}/part-b.avro", [{**ROWS[0], "doc_id": 2}], SCHEMA)
    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .option("cleanSource", "delete")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: a+b
        write_avro_ocf(f"{land}/part-c.avro", [{**ROWS[0], "doc_id": 3}], SCHEMA)
        q.processAllAvailable()  # batch 2: c; commit(1) retires a+b
        write_avro_ocf(f"{land}/part-d.avro", [{**ROWS[0], "doc_id": 4}], SCHEMA)
        q.processAllAvailable()  # batch 3: d; commit(2) retires c
        write_avro_ocf(f"{land}/part-e.avro", [{**ROWS[0], "doc_id": 5}], SCHEMA)
        q.processAllAvailable()  # batch 4; earlier retirements now pruned
    finally:
        q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3, 4, 5]
    left = sorted(f.rsplit("/", 1)[-1] for f in glob.glob(f"{land}/*.avro"))
    assert "part-a.avro" not in left and "part-b.avro" not in left
    assert "part-c.avro" not in left  # retired waves gone from landing
    # the newest offset entry must no longer carry long-retired names
    # (pruning trails the engine's lazy commit delivery by a batch) —
    # bounded offset state is the point of retention
    offs = sorted(glob.glob(f"{chk}/offsets/*"), key=lambda p: int(p.rsplit("/", 1)[-1]))
    flat = open(offs[-1]).read()
    assert "part-a.avro" not in flat and "part-b.avro" not in flat


def test_stream_clean_source_archive_moves_files(spark):
    """cleanSource=archive: committed files MOVE to sourceArchiveDir
    (audit trail preserved) once the engine delivers their commit;
    ingestion continues over the cleaned directory."""
    import glob

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfarch_{uuid.uuid4().hex[:8]}_")
    land, arch, sink, chk = (
        f"{base}/land", f"{base}/archive", f"{base}/sink", f"{base}/chk"
    )
    register(spark)
    write_avro_ocf(f"{land}/part-a.avro", ROWS[:2], SCHEMA)
    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .option("cleanSource", "archive")
        .option("sourceArchiveDir", arch)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: part-a
        write_avro_ocf(f"{land}/part-b.avro", ROWS[2:], SCHEMA)
        q.processAllAvailable()  # batch 2: part-b; commit(1) archives part-a
    finally:
        q.stop()
    assert sorted(r["doc_id"] for r in spark.read.parquet(sink).collect()) == [1, 2, 3]
    archived = sorted(f.rsplit("/", 1)[-1] for f in glob.glob(f"{arch}/*.avro"))
    landing = sorted(f.rsplit("/", 1)[-1] for f in glob.glob(f"{land}/*.avro"))
    assert "part-a.avro" in archived  # the committed batch moved out
    # every file is in exactly one place — moved, never copied or lost
    assert sorted(archived + landing) == ["part-a.avro", "part-b.avro"]


def test_stream_clean_source_restart_after_clean(spark):
    """Restart over a retention-cleaned landing dir: the checkpointed
    offset still names retired files that no longer exist — the
    reader treats that as pruned state (no rewind error, no
    re-ingest) and keeps consuming new files; the retired file's
    clean-up then completes on the restarted query's first commit."""
    import glob
    import os as _os

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfcrst_{uuid.uuid4().hex[:8]}_")
    land, sink, chk = f"{base}/land", f"{base}/sink", f"{base}/chk"
    register(spark)

    def run():
        return (
            spark.readStream.format("kaop_avro")
            .option("path", land)
            .option("cleanSource", "delete")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(processingTime="0 seconds")
            .start()
        )

    write_avro_ocf(f"{land}/part-a.avro", [{**ROWS[0], "doc_id": 1}], SCHEMA)
    write_avro_ocf(f"{land}/part-b.avro", [{**ROWS[0], "doc_id": 2}], SCHEMA)
    q = run()
    try:
        q.processAllAvailable()  # batch 1: a+b
        write_avro_ocf(f"{land}/part-c.avro", [{**ROWS[0], "doc_id": 3}], SCHEMA)
        q.processAllAvailable()  # batch 2: c; commit(1) retires a+b
    finally:
        q.stop()
    assert not _os.path.exists(f"{land}/part-a.avro")
    write_avro_ocf(f"{land}/part-d.avro", [{**ROWS[0], "doc_id": 4}], SCHEMA)
    q = run()  # fresh instance; checkpointed offsets name retired files
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3, 4]  # no rewind, no re-ingest, no skip
    landing = sorted(f.rsplit("/", 1)[-1] for f in glob.glob(f"{land}/*.avro"))
    assert "part-a.avro" not in landing and "part-b.avro" not in landing


def test_recursive_schema_spark_read_as_json_column(spark, tmp_path):
    """Recursive schemas (linked lists / trees) have no finite struct
    type: the recursive-typed FIELD surfaces as a string column of
    deterministic JSON, non-recursive siblings keep native types —
    through BOTH batch read paths, which must agree."""
    import json as _json

    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    register(spark)
    schema = {
        "type": "record", "name": "Node",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "label", "type": "string"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    rows = [
        {"doc_id": 1, "label": "a",
         "next": {"doc_id": 10, "label": "a1",
                  "next": {"doc_id": 100, "label": "a2", "next": None}}},
        {"doc_id": 2, "label": "b", "next": None},
    ]
    base = str(tmp_path / "nodes")
    write_avro_ocf(f"{base}/p0.avro", rows, schema)
    df = read_avro_ocf(spark, base)
    assert dict(df.dtypes) == {
        "doc_id": "bigint", "label": "string", "next": "string"}
    got = {r["doc_id"]: r["next"] for r in df.collect()}
    assert got[2] is None
    chain = _json.loads(got[1])
    assert chain["doc_id"] == 10 and chain["next"]["doc_id"] == 100
    assert chain["next"]["next"] is None
    via_ds = {
        r["doc_id"]: r["next"]
        for r in spark.read.format("kaop_avro").option("path", base).load().collect()
    }
    assert via_ds == got  # mapInPandas path and DataSource path agree


def test_recursive_tree_round_trip(tmp_path):
    """A branching recursive type (binary tree) with arrays of
    self-references round-trips the container bytes, both codecs."""
    schema = {
        "type": "record", "name": "Tree",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "kids", "type": {"type": "array", "items": "Tree"}},
        ],
    }
    tree = {"v": 1, "kids": [
        {"v": 2, "kids": [{"v": 4, "kids": []}]},
        {"v": 3, "kids": []},
    ]}
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"tree_{codec}.avro")
        write_avro_ocf(p, [tree], schema, codec=codec)
        _, got = parse_ocf(open(p, "rb").read())
        assert got == [tree]


def test_bytes_to_string_promotion_requires_utf8():
    """Hypothesis-found edge: spec bytes->string promotion assumes
    UTF-8 — non-decodable bytes raise a named resolution ValueError,
    not a bare UnicodeDecodeError."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    w = {"type": "record", "name": "R",
         "fields": [{"name": "b", "type": "bytes"}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "b", "type": "string"}]}
    assert resolve_record({"b": "ok".encode()}, w, r) == {"b": "ok"}
    with pytest.raises(ValueError, match="not valid UTF-8"):
        resolve_record({"b": b"\x00\xff"}, w, r)


def test_manifest_publish_gives_up_after_retries(tmp_path, monkeypatch):
    """_publish_manifest raises RuntimeError (documented abort) when a
    concurrent writer wins EVERY retry — no silent last-writer-wins."""
    from kafka_avro_order_processing_spark.sources import avro_ocf as mod

    uri = f"file://{tmp_path}/lake"
    import pyarrow.fs as pafs

    fs, rel = pafs.FileSystem.from_uri(uri)
    fs.create_dir(rel, recursive=True)
    real_write = mod._write_manifest

    def always_lose(path, manifest):
        real_write(path, manifest)
        real_write(path, {"parts": ["part-advers.avro"], "version": 10**6,
                          "writer": "adversary"})

    monkeypatch.setattr(mod, "_write_manifest", always_lose)
    with pytest.raises(RuntimeError, match="concurrent writer"):
        mod._publish_manifest(uri, lambda cur: {**cur, "parts": ["p.avro"]},
                              max_retries=3)


def test_clean_source_option_validation(spark):
    """Bad retention configs fail fast at stream construction."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        AvroOcfStreamReader,
    )

    with pytest.raises(ValueError, match="off\\|delete\\|archive"):
        AvroOcfStreamReader("/x", {}, [], clean_source="purge")
    with pytest.raises(ValueError, match="sourceArchiveDir"):
        AvroOcfStreamReader("/x", {}, [], clean_source="archive")
    with pytest.raises(ValueError, match="differ"):
        AvroOcfStreamReader("/x", {}, [], clean_source="archive",
                            archive_dir="/x/")


# --------------------------------------------------------------------------
# per-part column stats + file-skipping filter pushdown (statsPruning)
# --------------------------------------------------------------------------

def _stats_imports():
    from kafka_avro_order_processing_spark.sources import avro_ocf as mod

    return mod


def test_collect_stats_shapes():
    mod = _stats_imports()
    recs = [
        {"a": 3, "b": "m", "c": None, "d": True, "e": 1.5},
        {"a": -7, "b": "zz", "c": None, "d": False, "e": float("nan")},
        {"a": 10, "b": None, "c": None, "d": None, "e": 2.0},
    ]
    st = mod.collect_stats(recs, ["a", "b", "c", "d", "e"])
    assert st["rows"] == 3
    assert st["cols"]["a"] == {"nulls": 0, "min": -7, "max": 10}
    assert st["cols"]["b"] == {"nulls": 1, "min": "m", "max": "zz"}
    # all-null column: null count only, no min/max
    assert st["cols"]["c"] == {"nulls": 3}
    # bools are not orderable stats (Spark bool vs Python int subclass)
    assert "min" not in st["cols"]["d"]
    # a NaN anywhere poisons ordering -> min/max dropped, nulls kept
    assert "min" not in st["cols"]["e"] and st["cols"]["e"]["nulls"] == 0


def test_parse_ocf_meta_prefix_and_extra_meta(tmp_path):
    mod = _stats_imports()
    p = str(tmp_path / "m.avro")
    write_avro_ocf(p, ROWS, SCHEMA, extra_meta={"kaop.stats": b'{"rows": 3}'})
    raw = open(p, "rb").read()
    meta = mod.parse_ocf_meta(raw[:65536])
    assert meta["kaop.stats"] == b'{"rows": 3}'
    assert "avro.schema" in meta
    # records still decode (extra metadata is spec-legal)
    _, recs = parse_ocf(raw)
    assert recs == ROWS
    # a truncated prefix raises instead of returning a partial map
    with pytest.raises(ValueError):
        mod.parse_ocf_meta(raw[:20])
    # the avro. namespace is reserved by the spec
    with pytest.raises(ValueError, match="reserved"):
        mod.ocf_bytes(ROWS, SCHEMA, extra_meta={"avro.codec": b"x"})


def test_header_stats_probe(tmp_path):
    mod = _stats_imports()
    p = str(tmp_path / "s.avro")
    recs = [{"doc_id": i, "title": f"t{i:03d}", "score": float(i), "lang": None,
             "flags": [], "ok": True} for i in range(5, 42)]
    write_avro_ocf(p, recs, SCHEMA,
                   extra_meta=mod._stats_meta(recs, ["doc_id", "title", "score"]))
    st = mod._header_stats(p)
    assert st["rows"] == 37
    assert st["cols"]["doc_id"] == {"nulls": 0, "min": 5, "max": 41}
    assert st["cols"]["score"]["max"] == 41.0
    # a part with no stats entry yields None (reader keeps the file)
    q = str(tmp_path / "nostats.avro")
    write_avro_ocf(q, recs[:2], SCHEMA)
    assert mod._header_stats(q) is None


def test_file_may_match_predicate():
    mod = _stats_imports()
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
        LessThan, LessThanOrEqual, StringStartsWith,
    )

    st = {"rows": 10, "cols": {
        "v": {"nulls": 0, "min": 10.0, "max": 20.0},
        "s": {"nulls": 2, "min": "apple", "max": "mango"},
        "n": {"nulls": 10},
        "u": {"nulls": 3},  # 3 of 10 null, values unorderable
    }}
    may = mod._file_may_match
    # range overlap
    assert may(st, [EqualTo(("v",), 15.0)])
    assert not may(st, [EqualTo(("v",), 25.0)])
    assert not may(st, [GreaterThan(("v",), 20.0)])
    assert may(st, [GreaterThanOrEqual(("v",), 20.0)])
    assert not may(st, [LessThan(("v",), 10.0)])
    assert may(st, [LessThanOrEqual(("v",), 10.0)])
    assert not may(st, [In(("v",), (1.0, 2.0, 30.0))])
    assert may(st, [In(("v",), (1.0, 12.5))])
    # AND semantics: one dead filter kills the file
    assert not may(st, [EqualTo(("v",), 15.0), LessThan(("v",), 5.0)])
    # null tests
    assert not may(st, [IsNull(("v",))])
    assert may(st, [IsNull(("s",))])
    assert not may(st, [IsNotNull(("n",))])
    assert may(st, [IsNotNull(("u",))])
    # an all-null column can satisfy no comparison
    assert not may(st, [EqualTo(("n",), 1)])
    # unorderable-but-not-all-null column: conservative keep
    assert may(st, [EqualTo(("u",), 1)])
    # unknown column / absent stats: keep
    assert may(st, [EqualTo(("zzz",), 1)])
    assert may(None, [EqualTo(("v",), 99.0)])
    # prefix pruning
    assert may(st, [StringStartsWith(("s",), "ba")])
    assert not may(st, [StringStartsWith(("s",), "z")])
    assert not may(st, [StringStartsWith(("s",), "aa")])
    # cross-type comparison: keep, never raise
    assert may(st, [EqualTo(("s",), 42)])


def test_pruning_reader_partitions_unit(tmp_path, spark):
    """Direct reader check: disjoint-range parts drop out of the plan."""
    mod = _stats_imports()
    from pyspark.sql.datasource import LessThan

    d = str(tmp_path / "lake")
    for lo, name in ((0, "part-a.avro"), (1000, "part-b.avro"), (5000, "part-c.avro")):
        recs = [{"doc_id": lo + i, "title": f"t{lo+i}", "score": float(lo + i),
                 "lang": None, "flags": [], "ok": True} for i in range(50)]
        write_avro_ocf(f"{d}/{name}", recs, SCHEMA,
                       extra_meta=mod._stats_meta(recs, ["doc_id", "score"]))
    names = [f["name"] for f in SCHEMA["fields"]]
    r = mod.AvroOcfPruningReader(d, SCHEMA, names)
    r.pushFilters([LessThan(("score",), 800.0)])
    parts = [p.value.rsplit("/", 1)[-1] for p in r.partitions()]
    assert parts == ["part-a.avro"]
    # no pushed filters -> every part planned
    r2 = mod.AvroOcfPruningReader(d, SCHEMA, names)
    assert len(r2.partitions()) == 3


def test_manifest_carries_stats(tmp_path, spark):
    """URI (manifest) writes fold each part's stats into the manifest;
    the pruning reader plans from that single read — and an overwrite
    drops the replaced parts' stats entries."""
    mod = _stats_imports()
    from pyspark.sql.datasource import GreaterThan

    uri = "file://" + str(tmp_path / "mlake")
    mod.register(spark)
    spark.range(0, 100).selectExpr("id", "CAST(id AS DOUBLE) AS v") \
        .coalesce(1).write.format("kaop_avro").option("path", uri).mode("append").save()
    spark.range(1000, 1100).selectExpr("id", "CAST(id AS DOUBLE) AS v") \
        .coalesce(1).write.format("kaop_avro").option("path", uri).mode("append").save()
    m = mod._read_manifest(uri)
    assert sorted(m["stats"]) == sorted(m["parts"]) and len(m["parts"]) == 2
    ranges = sorted(
        (s["cols"]["v"]["min"], s["cols"]["v"]["max"]) for s in m["stats"].values()
    )
    assert ranges == [(0.0, 99.0), (1000.0, 1099.0)]
    # pruning reader consumes manifest stats (no header probing needed)
    names = ["id", "v"]
    r = mod.AvroOcfPruningReader(uri, None, names)
    r.pushFilters([GreaterThan(("v",), 500.0)])
    assert len(r.partitions()) == 1
    # overwrite: replaced parts' stats leave the manifest with them
    spark.range(7).selectExpr("id", "CAST(id AS DOUBLE) AS v") \
        .coalesce(1).write.format("kaop_avro").option("path", uri).mode("overwrite").save()
    m2 = mod._read_manifest(uri)
    assert sorted(m2["stats"]) == sorted(m2["parts"]) and len(m2["parts"]) == 1


def test_stats_pruning_e2e_poison(tmp_path, spark):
    """Engine-level proof the scan SKIPS dead files: a planted part
    whose header stats are disjoint from the filter has a CORRUPT body
    — the filtered statsPruning read succeeds (file never opened),
    while the same read without pruning fails loudly."""
    mod = _stats_imports()
    mod.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    d = str(tmp_path / "plake")
    spark.range(0, 200).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v", "CONCAT('u', CAST(id AS STRING)) AS tag"
    ).coalesce(1).write.format("kaop_avro").option("path", d).mode("append").save()
    # poison: stats claim v in [9e9, 9.9e9]; body is corrupt; name sorts last
    first = mod._list_avro(d)[0]
    pschema, _ = parse_ocf(open(first, "rb").read())
    prec = [{"id": 0, "v": 9.9e9, "tag": "poison"}, {"id": 1, "v": 9.0e9, "tag": "poison"}]
    raw = mod.ocf_bytes(prec, pschema, extra_meta=mod._stats_meta(prec, ["id", "v", "tag"]))
    corrupted = raw[:-16] + bytes(16)  # break the trailing sync marker
    assert corrupted != raw
    with open(f"{d}/part-zz-poison.avro", "wb") as f:
        f.write(corrupted)

    base = spark.read.format("kaop_avro").option("path", d)
    pruned = (
        spark.read.format("kaop_avro").option("path", d)
        .option("statsPruning", "true").load().filter("v < 150.0")
    )
    assert pruned.count() == 150  # poison skipped, answer exact
    # same filter, plain reader: the dead file IS opened -> corrupt
    with pytest.raises(Exception, match="sync marker|corrupt"):
        base.load().filter("v < 150.0").count()
    # overlapping filter with pruning on: poison not prunable by v-range?
    # it IS (9e9 > 150) — but a filter touching its claimed range must
    # open it and surface the corruption, not silently drop data
    with pytest.raises(Exception, match="sync marker|corrupt"):
        spark.read.format("kaop_avro").option("path", d) \
            .option("statsPruning", "true").load().filter("v > 5e9").count()


def test_stats_pruning_answers_match_plain_reader(tmp_path, spark):
    """Pruning is an optimization only: overlapping filters return the
    exact rows the plain reader returns."""
    mod = _stats_imports()
    mod.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    d = str(tmp_path / "qlake")
    for lo in (0, 100, 200):
        spark.range(lo, lo + 100).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS v") \
            .coalesce(1).write.format("kaop_avro").option("path", d).mode("append").save()
    plain = spark.read.format("kaop_avro").option("path", d).load() \
        .filter("v >= 3.0 AND id < 250").orderBy("id").collect()
    pruned = spark.read.format("kaop_avro").option("path", d) \
        .option("statsPruning", "true").load() \
        .filter("v >= 3.0 AND id < 250").orderBy("id").collect()
    assert plain == pruned and len(plain) > 0


def test_stats_pruning_downgrades_with_reader_schema(tmp_path, spark):
    """readerSchema + statsPruning -> plain reader (alias resolution can
    remap names; stats recorded under writer names are not trusted)."""
    mod = _stats_imports()
    ds = mod.AvroOcfDataSource(options={
        "path": "/nonexistent",
        "statspruning": "true",
        "readerschema": '{"type":"record","name":"R","fields":[]}',
    })
    r = ds.reader(None)
    assert type(r) is mod.AvroOcfReader


# --------------------------------------------------------------------------
# per-part bloom filters (bloomColumns): point-lookup file skipping
# --------------------------------------------------------------------------

def test_bloom_build_and_membership():
    mod = _stats_imports()
    bl = mod._bloom_build(list(range(0, 2000, 2)) + [None])
    assert bl["t"] == "i" and bl["m"] <= mod._BLOOM_MAX_BITS
    # zero false negatives, ever
    assert all(mod._bloom_may_contain(bl, v) for v in range(0, 2000, 2))
    # false positive rate in the designed ballpark (deterministic set)
    fp = sum(mod._bloom_may_contain(bl, v) for v in range(1, 2000, 2))
    assert fp / 1000 < 0.05
    # type mismatch -> keep (no canonical comparison possible)
    assert mod._bloom_may_contain(bl, "6")
    sbl = mod._bloom_build(["apple", "mango"])
    assert sbl["t"] == "s"
    assert mod._bloom_may_contain(sbl, "apple")
    assert not mod._bloom_may_contain(sbl, "pear")
    assert mod._bloom_may_contain(sbl, 7)  # int probe on str bloom: keep
    # unsupported value types build no bloom
    assert mod._bloom_build([1.5, 2.5]) is None
    assert mod._bloom_build([True, False]) is None
    assert mod._bloom_build([None]) is None


def test_bloom_stats_prune_equality(tmp_path):
    mod = _stats_imports()
    from pyspark.sql.datasource import EqualTo, In

    recs_a = [{"doc_id": i, "title": f"t{i}", "score": 0.0, "lang": None,
               "flags": [], "ok": True} for i in range(0, 100, 2)]   # evens
    recs_b = [{"doc_id": i, "title": f"t{i}", "score": 0.0, "lang": None,
               "flags": [], "ok": True} for i in range(1, 100, 2)]   # odds
    d = str(tmp_path / "bl")
    for name, recs in (("part-a.avro", recs_a), ("part-b.avro", recs_b)):
        st = mod.collect_stats(recs, ["doc_id", "title"], bloom_cols={"doc_id"})
        write_avro_ocf(f"{d}/{name}", recs, SCHEMA,
                       extra_meta={mod.STATS_META_KEY:
                                   __import__("json").dumps(st).encode()})
    names = [f["name"] for f in SCHEMA["fields"]]
    # min/max is useless here (both parts span ~[0, 99]) — bloom prunes
    r = mod.AvroOcfPruningReader(d, SCHEMA, names)
    r.pushFilters([EqualTo(("doc_id",), 42)])
    assert [p.value.rsplit("/", 1)[-1] for p in r.partitions()] == ["part-a.avro"]
    r2 = mod.AvroOcfPruningReader(d, SCHEMA, names)
    r2.pushFilters([In(("doc_id",), (7, 13))])
    assert [p.value.rsplit("/", 1)[-1] for p in r2.partitions()] == ["part-b.avro"]
    # IN spanning both parities keeps both
    r3 = mod.AvroOcfPruningReader(d, SCHEMA, names)
    r3.pushFilters([In(("doc_id",), (2, 3))])
    assert len(r3.partitions()) == 2


def test_bloom_columns_option_validation(tmp_path, spark):
    mod = _stats_imports()
    mod.register(spark)
    df = spark.range(5).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    with pytest.raises(Exception, match="no such column"):
        df.write.format("kaop_avro").option("path", str(tmp_path / "x")) \
            .option("bloomColumns", "nope").mode("append").save()
    with pytest.raises(Exception, match="only integer and string"):
        df.write.format("kaop_avro").option("path", str(tmp_path / "y")) \
            .option("bloomColumns", "v").mode("append").save()


def test_bloom_e2e_point_lookup(tmp_path, spark):
    """Hash-distributed write + bloomColumns: a point lookup opens only
    the parts whose bloom admits the key, proven by a corrupt poison
    part whose bloom lacks it."""
    mod = _stats_imports()
    mod.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    d = str(tmp_path / "blake")
    (spark.range(0, 1000)
        .selectExpr("id AS k", "CONCAT('row', CAST(id AS STRING)) AS payload")
        .repartition(4, "k")   # hash split: every part spans ~full range
        .write.format("kaop_avro").option("path", d)
        .option("bloomColumns", "k").mode("append").save())
    first = mod._list_avro(d)[0]
    pschema, _ = parse_ocf(open(first, "rb").read())
    prec = [{"k": 10**9 + i, "payload": "poison"} for i in range(50)]
    st = mod.collect_stats(prec, ["k", "payload"], bloom_cols={"k"})
    raw = mod.ocf_bytes(prec, pschema,
                        extra_meta={mod.STATS_META_KEY:
                                    __import__("json").dumps(st).encode()})
    with open(f"{d}/part-zz-poison.avro", "wb") as f:
        f.write(raw[:-16] + bytes(16))
    got = (spark.read.format("kaop_avro").option("path", d)
           .option("statsPruning", "true").load()
           .filter("k = 777").collect())
    assert [(r.k, r.payload) for r in got] == [(777, "row777")]
    # without pruning the corrupt part is opened and fails
    with pytest.raises(Exception, match="sync marker|corrupt"):
        spark.read.format("kaop_avro").option("path", d).load() \
            .filter("k = 777").collect()


# --------------------------------------------------------------------------
# lake maintenance: compact_avro_dir + vacuum_avro_dir
# --------------------------------------------------------------------------

def test_compact_local_dir_preserves_rows_and_bloom(tmp_path, spark):
    mod = _stats_imports()
    mod.register(spark)
    d = str(tmp_path / "clake")
    for lo in range(0, 500, 100):  # five small appends
        (spark.range(lo, lo + 100)
            .selectExpr("id AS k", "CAST(id % 9 AS DOUBLE) AS v")
            .coalesce(1).write.format("kaop_avro").option("path", d)
            .option("bloomColumns", "k").mode("append").save())
    assert len(mod._list_avro(d)) == 5
    res = mod.compact_avro_dir(spark, d, target_records=250)
    assert res == {"parts_before": 5, "parts_after": 2, "rows": 500}
    back = spark.read.format("kaop_avro").option("path", d).load()
    assert back.count() == 500
    assert back.selectExpr("sum(k)").collect()[0][0] == sum(range(500))
    # new parts regenerated stats AND bloom coverage
    for f in mod._list_avro(d):
        st = mod._header_stats(f)
        assert st and "bloom" in st["cols"]["k"] and "min" in st["cols"]["v"]
    # bloom pruning still works post-compaction
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    got = (spark.read.format("kaop_avro").option("path", d)
           .option("statsPruning", "true").load().filter("k = 123").collect())
    assert [(r.k,) for r in got] == [(123,)]


def test_compact_manifest_dir_hides_uncommitted(tmp_path, spark):
    """Compaction of a URI dir is one manifest swap: committed rows
    survive exactly, an uncommitted poison part stays invisible
    throughout and is then vacuumable."""
    mod = _stats_imports()
    mod.register(spark)
    uri = "file://" + str(tmp_path / "culake")
    for lo in (0, 300):
        (spark.range(lo, lo + 300)
            .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
            .coalesce(1).write.format("kaop_avro").option("path", uri)
            .mode("append").save())
    # a final-named part no commit published
    write_avro_ocf(f"{uri}/part-zz-orphan.avro",
                   [{"k": -1, "v": -1.0}],
                   {"type": "record", "name": "SparkRecord", "fields": [
                       {"name": "k", "type": ["null", "long"]},
                       {"name": "v", "type": ["null", "double"]}]})
    res = mod.compact_avro_dir(spark, uri, target_records=600)
    assert res["parts_before"] == 2 and res["parts_after"] == 1
    back = spark.read.format("kaop_avro").option("path", uri).load()
    assert back.count() == 600 and back.selectExpr("min(k)").collect()[0][0] == 0
    # orphan survives on disk but stays invisible; vacuum removes it
    m = mod._read_manifest(uri)
    assert "part-zz-orphan.avro" not in m["parts"]
    deleted = mod.vacuum_avro_dir(uri, grace_seconds=0.0)
    assert "part-zz-orphan.avro" in deleted
    assert spark.read.format("kaop_avro").option("path", uri).load().count() == 600


def test_vacuum_grace_and_safety(tmp_path, spark):
    mod = _stats_imports()
    mod.register(spark)
    d = str(tmp_path / "vlake")
    (spark.range(10).selectExpr("id AS k")
        .coalesce(1).write.format("kaop_avro").option("path", d)
        .mode("append").save())
    # a fresh _tmp_ leftover: inside grace -> kept; grace 0 -> deleted
    with open(f"{d}/_tmp_crashed.avro", "wb") as f:
        f.write(b"junk")
    assert mod.vacuum_avro_dir(d, grace_seconds=3600) == []
    assert mod.vacuum_avro_dir(d, grace_seconds=0.0) == ["_tmp_crashed.avro"]
    # committed parts never touched (local dir, no manifest)
    assert len(mod._list_avro(d)) == 1
    assert spark.read.format("kaop_avro").option("path", d).load().count() == 10


def test_compact_evolved_dir_with_reader_schema(tmp_path, spark):
    """reader_schema compacts files written under different schemas
    into one upgraded part set."""
    mod = _stats_imports()
    mod.register(spark)
    d = str(tmp_path / "elake")
    s1 = {"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"}]}
    s2 = {"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"},
        {"name": "tag", "type": "string"}]}
    write_avro_ocf(f"{d}/part-a.avro", [{"k": 1}, {"k": 2}], s1)
    write_avro_ocf(f"{d}/part-b.avro", [{"k": 3, "tag": "x"}], s2)
    reader = {"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"},
        {"name": "tag", "type": "string", "default": "none"}]}
    res = mod.compact_avro_dir(spark, d, target_records=10, reader_schema=reader)
    assert res["parts_after"] == 1
    rows = sorted(
        (r.k, r.tag)
        for r in spark.read.format("kaop_avro").option("path", d).load().collect()
    )
    assert rows == [(1, "none"), (2, "none"), (3, "x")]


def test_stream_written_parts_carry_stats_and_prune(spark):
    """The stream writer embeds per-part stats too (header + manifest
    epoch swap), so a landing dir later read as a batch table prunes
    like any other lake dir — including bloomColumns on the sink."""
    mod = _stats_imports()
    mod.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    base = tempfile.mkdtemp(prefix=f"ocfswst_{uuid.uuid4().hex[:8]}_")
    src, chk = f"{base}/src", f"{base}/chk"
    uri = f"file://{base}/out"

    def drain(rows):
        spark.createDataFrame(rows, "k long, v double").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema("k long, v double")
            .parquet(src)
            .writeStream.format("kaop_avro")
            .option("path", uri)
            .option("bloomColumns", "k")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain([(1, 10.0), (2, 20.0)])
    drain([(100, 1000.0), (200, 2000.0)])
    m = mod._read_manifest(uri)
    assert sorted(m["stats"]) == sorted(m["parts"]) and len(m["parts"]) == 2
    assert all("bloom" in s["cols"]["k"] for s in m["stats"].values())
    # min/max pruning on v and bloom pruning on k, from manifest stats
    from pyspark.sql.datasource import EqualTo, GreaterThan

    r = mod.AvroOcfPruningReader(uri, None, ["k", "v"])
    r.pushFilters([GreaterThan(("v",), 500.0)])
    assert len(r.partitions()) == 1
    r2 = mod.AvroOcfPruningReader(uri, None, ["k", "v"])
    r2.pushFilters([EqualTo(("k",), 2)])
    assert len(r2.partitions()) == 1
    got = (spark.read.format("kaop_avro").option("path", uri)
           .option("statsPruning", "true").load().filter("k = 200").collect())
    assert [(r_.k, r_.v) for r_ in got] == [(200, 2000.0)]


def test_max_records_per_part_batch_write(tmp_path, spark):
    """maxRecordsPerPart splits one task's rows into bounded container
    files, each carrying its own stats; content is exact."""
    mod = _stats_imports()
    mod.register(spark)
    d = str(tmp_path / "splitlake")
    (spark.range(1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .coalesce(1)  # ONE task...
        .write.format("kaop_avro").option("path", d)
        .option("maxRecordsPerPart", "300")  # ...but bounded parts
        .option("bloomColumns", "k").mode("append").save())
    files = mod._list_avro(d)
    assert len(files) == 4  # 300+300+300+100
    sizes = sorted(mod._header_stats(f)["rows"] for f in files)
    assert sizes == [100, 300, 300, 300]
    assert all("bloom" in mod._header_stats(f)["cols"]["k"] for f in files)
    back = spark.read.format("kaop_avro").option("path", d).load()
    assert back.count() == 1000
    assert back.selectExpr("sum(k)").collect()[0][0] == sum(range(1000))
    with pytest.raises(Exception, match="maxRecordsPerPart"):
        spark.range(3).selectExpr("id AS k").write.format("kaop_avro") \
            .option("path", str(tmp_path / "bad")) \
            .option("maxRecordsPerPart", "0").mode("append").save()


def test_max_records_per_part_uri_stream_write(spark):
    """The stream writer honors the cap too; manifest stats cover every
    split part of every epoch."""
    mod = _stats_imports()
    mod.register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfswcap_{uuid.uuid4().hex[:8]}_")
    src, chk = f"{base}/src", f"{base}/chk"
    uri = f"file://{base}/out"
    spark.createDataFrame([(i, float(i)) for i in range(500)],
                          "k long, v double").coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema("k long, v double").parquet(src)
        .writeStream.format("kaop_avro")
        .option("path", uri)
        .option("maxRecordsPerPart", "200")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    m = mod._read_manifest(uri)
    assert len(m["parts"]) == 3  # 200+200+100
    assert sorted(m["stats"]) == sorted(m["parts"])
    assert sorted(s["rows"] for s in m["stats"].values()) == [100, 200, 200]
    back = spark.read.format("kaop_avro").option("path", uri).load()
    assert back.count() == 500


def test_not_equal_pruning():
    """Not(EqualTo): a constant-valued (or all-null) part proves !=
    dead; anything else keeps the file."""
    mod = _stats_imports()
    from pyspark.sql.datasource import EqualTo, Not

    const = {"rows": 5, "cols": {"s": {"nulls": 0, "min": "x", "max": "x"}}}
    mixed = {"rows": 5, "cols": {"s": {"nulls": 0, "min": "a", "max": "x"}}}
    allnull = {"rows": 5, "cols": {"s": {"nulls": 5}}}
    constnull = {"rows": 5, "cols": {"s": {"nulls": 2, "min": "x", "max": "x"}}}
    may = mod._file_may_match
    ne_x = Not(EqualTo(("s",), "x"))
    assert not may(const, [ne_x])         # every row == x
    assert not may(allnull, [ne_x])       # nulls fail != too
    assert not may(constnull, [ne_x])     # nulls + constant x
    assert may(mixed, [ne_x])             # some row may differ
    assert may(const, [Not(EqualTo(("s",), "y"))])  # != y is satisfied
    assert mod._stat_filter_supported(ne_x)


def test_stream_cap_retention_restart_combined(spark):
    """The three newest stream-reader features interacting: a capped
    drain with cleanSource=delete retires files as epochs commit, a
    restart from the checkpoint then ingests a second backlog under
    the same cap and retention — every row exactly once, landing dir
    empty at the end, per-batch cap never exceeded."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    base = tempfile.mkdtemp(prefix=f"ocfmix_{uuid.uuid4().hex[:8]}_")
    land, sink, chk = f"{base}/land", f"{base}/sink", f"{base}/chk"
    register(spark)
    batch_sizes: list[int] = []

    def run_query():
        import glob as _g

        def body(df, _eid):
            rows = df.collect()
            if rows:
                batch_sizes.append(len({r["doc_id"] for r in rows}))
                spark.createDataFrame(rows, df.schema).write.mode("append") \
                    .parquet(sink)

        return (
            spark.readStream.format("kaop_avro")
            .option("path", land)
            .option("maxFilesPerBatch", "2")
            .option("cleanSource", "delete")
            .load()
            .writeStream.foreachBatch(body)
            .option("checkpointLocation", chk)
            .trigger(processingTime="0 seconds")
            .start()
        )

    for i in range(4):  # first backlog
        write_avro_ocf(f"{land}/part-a{i}.avro",
                       [{**ROWS[0], "doc_id": 10 + i}], SCHEMA)
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import glob as _g
    assert _g.glob(f"{land}/*.avro") == []  # retention emptied the dir
    assert sorted(r["doc_id"] for r in spark.read.parquet(sink).collect()) \
        == [10, 11, 12, 13]

    for i in range(3):  # second backlog lands while the query is DOWN
        write_avro_ocf(f"{land}/part-b{i}.avro",
                       [{**ROWS[0], "doc_id": 20 + i}], SCHEMA)
    q = run_query()  # restart: consumed set restores from checkpoint
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r["doc_id"] for r in spark.read.parquet(sink).collect()) \
        == [10, 11, 12, 13, 20, 21, 22]  # once each: no rewind, no skip
    assert _g.glob(f"{land}/*.avro") == []
    assert all(s <= 2 for s in batch_sizes)  # one-file parts: cap bound


def test_stats_survive_lost_publish_race(tmp_path, monkeypatch):
    """A commit whose first manifest PUT loses to a concurrent append
    must, on retry, fold BOTH writers' parts AND both writers' stats
    into the winning manifest — the stats map may never silently drop
    the other writer's entries (pruning would then degrade to
    conservative keeps, but a lost part entry would be data loss)."""
    import json as _json

    mod = _stats_imports()
    d = str(tmp_path / "race")
    import os as _os
    _os.makedirs(d)
    real_write = mod._write_manifest
    hits = {"n": 0}

    other_stats = {"rows": 7, "cols": {"k": {"nulls": 0, "min": 1, "max": 7}}}

    def lose_once(path, manifest):
        real_write(path, manifest)
        if hits["n"] == 0:  # a concurrent append lands AFTER our PUT
            hits["n"] += 1
            cur = dict(manifest)
            cur["parts"] = sorted(set(cur.get("parts", [])) | {"part-other.avro"})
            stats = dict(cur.get("stats", {}))
            stats["part-other.avro"] = other_stats
            cur["stats"] = stats
            cur["version"] = int(cur.get("version", 0)) + 1
            cur["writer"] = "other-writer"
            real_write(path, cur)

    monkeypatch.setattr(mod, "_write_manifest", lose_once)
    mine_stats = {"rows": 3, "cols": {"k": {"nulls": 0, "min": 10, "max": 12}}}

    def mutate(cur: dict) -> dict:
        cur["parts"] = sorted(set(cur.get("parts", [])) | {"part-mine.avro"})
        mod._set_manifest_stats(cur, {"part-mine.avro": mine_stats})
        return cur

    final = mod._publish_manifest(d, mutate)
    assert final["parts"] == ["part-mine.avro", "part-other.avro"]
    assert final["stats"]["part-mine.avro"] == mine_stats
    assert final["stats"]["part-other.avro"] == other_stats  # kept!
    on_disk = _json.loads(open(f"{d}/_manifest.json").read())
    assert on_disk == final


def test_parse_stats_filter_validation():
    """statsFilter parses to the same Filter objects pushFilters gets,
    and every malformed spec fails loudly at construction time."""
    from pyspark.sql.datasource import EqualTo, In, IsNull, Not

    mod = _stats_imports()
    names = ["k", "v", "tag"]
    fs = mod._parse_stats_filter(
        '[["k","=",5],["v",">",1.5],["tag","in",["a","b"]],'
        '["tag","is_null"],["k","!=",9],["tag","starts_with","u"]]',
        names,
    )
    assert isinstance(fs[0], EqualTo) and fs[0].attribute == ("k",) and fs[0].value == 5
    assert isinstance(fs[2], In) and fs[2].value == ("a", "b")
    assert isinstance(fs[3], IsNull)
    assert isinstance(fs[4], Not) and isinstance(fs[4].child, EqualTo)
    for bad in (
        "not json",
        '{"k": 5}',                      # not a list of lists
        '[["nope","=",1]]',              # unknown column
        '[["k","~",1]]',                 # unknown op
        '[["k","="]]',                   # missing value
        '[["k","is_null",1]]',           # value where none allowed
        '[["k","in",[]]]',               # empty in-list
        '[["k","in",5]]',                # non-list in-list
        '[["tag","starts_with",7]]',     # non-string prefix
        '[["k","=",1,2]]',               # arity
    ):
        with pytest.raises(ValueError):
            mod._parse_stats_filter(bad, names)


def test_stream_stats_filter_reader_schema_conflict(spark):
    mod = _stats_imports()
    mod.register(spark)
    d = tempfile.mkdtemp(prefix=f"ocfsfrs_{uuid.uuid4().hex[:8]}_")
    spark.range(0, 5).selectExpr("id AS k").coalesce(1).write.format(
        "kaop_avro"
    ).option("path", d).mode("append").save()
    rs = '{"type":"record","name":"R","fields":[{"name":"k","type":"long"}]}'
    # streamReader construction is deferred to query start, so probe the
    # DataSource directly (options arrive lowercased from Spark)
    ds = mod.AvroOcfDataSource(
        options={
            "path": d,
            "readerschema": rs,
            "statsfilter": '[["k","=",1]]',
        }
    )
    with pytest.raises(ValueError, match="statsFilter cannot be combined"):
        ds.streamReader(None)


def test_stream_stats_filter_skips_poison_part(spark):
    """The stream twin of test_stats_pruning_e2e_poison: a landed part
    whose stats are disjoint from the statsFilter has a CORRUPT body —
    the filtered stream drains green (file never opened), the pruned
    name is still CONSUMED (it never reappears in a later batch), and
    a later matching file is picked up normally."""
    mod = _stats_imports()
    mod.register(spark)
    base = tempfile.mkdtemp(prefix=f"ocfsf_{uuid.uuid4().hex[:8]}_")
    land, chk, out = f"{base}/land", f"{base}/chk", f"{base}/out"
    import os

    os.makedirs(land)
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    ).coalesce(1).write.format("kaop_avro").option("path", land).mode(
        "append"
    ).save()
    # poison: stats claim v in [9e9, 9.9e9]; body corrupt
    first = mod._list_avro(land)[0]
    pschema, _ = parse_ocf(open(first, "rb").read())
    prec = [{"k": 0, "v": 9.9e9}, {"k": 1, "v": 9.0e9}]
    raw = mod.ocf_bytes(prec, pschema, extra_meta=mod._stats_meta(prec, ["k", "v"]))
    with open(f"{land}/part-zz-poison.avro", "wb") as f:
        f.write(raw[:-16] + bytes(16))

    def drain():
        q = (
            spark.readStream.format("kaop_avro")
            .option("path", land)
            .option("statsFilter", '[["v","<",100.0]]')
            .load()
            .filter("v < 100.0")  # row-level re-check is the query's job
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 10  # poison skipped
    # second drain: only the NEW matching file lands; the poison name
    # was consumed in batch 0 and must not resurface
    spark.createDataFrame([(100, 50.0)], "k long, v double").coalesce(
        1
    ).write.format("kaop_avro").option("path", land).mode("append").save()
    drain()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == sorted(list(range(10)) + [100])


def test_stream_stats_filter_partitions_unit(spark):
    """Offset bookkeeping with statsFilter: pruned names sit inside the
    offset (consumed) while partitions() omits them."""
    mod = _stats_imports()
    d = tempfile.mkdtemp(prefix=f"ocfsfu_{uuid.uuid4().hex[:8]}_")
    lo = [{"k": 1, "v": 1.0}, {"k": 2, "v": 2.0}]
    hi = [{"k": 3, "v": 1000.0}, {"k": 4, "v": 2000.0}]
    schema = {
        "type": "record", "name": "R",
        "fields": [{"name": "k", "type": "long"}, {"name": "v", "type": "double"}],
    }
    for name, recs in (("part-a.avro", lo), ("part-b.avro", hi)):
        mod.write_avro_ocf(
            f"{d}/{name}", recs, schema,
            extra_meta=mod._stats_meta(recs, ["k", "v"]),
        )
    from pyspark.sql.datasource import LessThan

    r = mod.AvroOcfStreamReader(
        d, schema, ["k", "v"], stat_filters=[LessThan(("v",), 100.0)]
    )
    end = r.latestOffset()
    assert sorted(end["files"]) == ["part-a.avro", "part-b.avro"]
    parts = r.partitions({"files": []}, end)
    assert [p.value.rsplit("/", 1)[-1] for p in parts] == ["part-a.avro"]


def test_write_avro_clustered_layout_and_validation(spark):
    """Clustered writes produce parts with tight, mostly disjoint
    min/max ranges — the layout where range pruning plans only
    overlapping parts — and validation is loud."""
    mod = _stats_imports()
    mod.register(spark)
    d = tempfile.mkdtemp(prefix=f"ocfclw_{uuid.uuid4().hex[:8]}_")
    df = spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    mod.write_avro_clustered(df, d, ["v"], num_parts=8)
    files = mod._list_avro(d)
    assert len(files) == 8
    stats = [mod._header_stats(f) for f in files]
    spans = sorted((s["cols"]["v"]["min"], s["cols"]["v"]["max"]) for s in stats)
    # each part spans a narrow slice; consecutive slices don't overlap
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
        assert hi1 - lo1 < 1000 / 4  # tight, not whole-range
    # the point: a selective range filter plans few parts
    from pyspark.sql.datasource import LessThan

    r = mod.AvroOcfPruningReader(d, None, ["k", "v"])
    r.pushFilters([LessThan(("v",), 100.0)])
    assert len(r.partitions()) <= 2
    with pytest.raises(ValueError, match="no such columns"):
        mod.write_avro_clustered(df, d, ["nope"])
    with pytest.raises(ValueError, match="at least one column"):
        mod.write_avro_clustered(df, d, [])


def test_compact_avro_dir_cluster_by(spark):
    """Compaction with cluster_by = OPTIMIZE…CLUSTER BY: many
    randomly-laid-out parts rewrite into few range-clustered ones,
    rows preserved exactly, and the compacted stats actually prune."""
    mod = _stats_imports()
    mod.register(spark)
    d = tempfile.mkdtemp(prefix=f"ocfclc_{uuid.uuid4().hex[:8]}_")
    df = spark.range(0, 900).selectExpr(
        "id AS k", "CAST(pmod(id * 7919, 900) AS DOUBLE) AS v"
    )
    # random layout: parts span the whole v-range
    df.repartition(6).write.format("kaop_avro").option("path", d).mode(
        "append"
    ).save()
    res = mod.compact_avro_dir(spark, d, target_records=300, cluster_by=["v"])
    assert res["rows"] == 900 and res["parts_after"] == 3
    stats = [mod._header_stats(f) for f in mod._list_avro(d)]
    spans = sorted((s["cols"]["v"]["min"], s["cols"]["v"]["max"]) for s in stats)
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
    back = spark.read.format("kaop_avro").option("path", d).load()
    assert back.count() == 900
    assert back.agg({"k": "sum"}).collect()[0][0] == sum(range(900))
    with pytest.raises(ValueError, match="no such columns"):
        mod.compact_avro_dir(spark, d, cluster_by=["nope"])


def test_bloom_bits_per_key_option(spark):
    """bloomBitsPerKey sizes the per-part filters: more bits per key →
    a strictly larger bitset and a lower measured false-positive rate;
    invalid values fail at writer construction."""
    mod = _stats_imports()
    mod.register(spark)
    vals = [f"key{i}" for i in range(500)]
    small = mod._bloom_build(vals, bits_per_key=2)
    big = mod._bloom_build(vals, bits_per_key=32)
    assert big["m"] > small["m"]

    def fp_rate(bloom):
        probes = [f"absent{i}" for i in range(2000)]
        return sum(mod._bloom_may_contain(bloom, p) for p in probes) / len(probes)

    assert fp_rate(big) < fp_rate(small)
    assert fp_rate(big) < 0.01
    # zero false negatives at any sizing
    assert all(mod._bloom_may_contain(small, v) for v in vals)
    assert all(mod._bloom_may_contain(big, v) for v in vals)
    # option plumbing: written parts carry the requested sizing
    d = tempfile.mkdtemp(prefix=f"ocfbbk_{uuid.uuid4().hex[:8]}_")
    df = spark.createDataFrame([(f"k{i}",) for i in range(200)], "k string")
    df.coalesce(1).write.format("kaop_avro").option("path", f"{d}/big").option(
        "bloomColumns", "k"
    ).option("bloomBitsPerKey", "32").mode("append").save()
    df.coalesce(1).write.format("kaop_avro").option("path", f"{d}/small").option(
        "bloomColumns", "k"
    ).option("bloomBitsPerKey", "2").mode("append").save()
    mb = mod._header_stats(mod._list_avro(f"{d}/big")[0])["cols"]["k"]["bloom"]["m"]
    ms = mod._header_stats(mod._list_avro(f"{d}/small")[0])["cols"]["k"]["bloom"]["m"]
    assert mb > ms
    with pytest.raises(Exception, match="bloomBitsPerKey"):
        df.write.format("kaop_avro").option("path", f"{d}/bad").option(
            "bloomColumns", "k"
        ).option("bloomBitsPerKey", "0").mode("append").save()


@pytest.mark.slow
def test_stream_reader_thousand_file_backlog_capped(spark):
    """maxFilesPerBatch at file-count scale: a 1000-file backlog with
    cap=100 drains in exactly-once fashion across >= 10 capped
    micro-batches, the cap is honored in EVERY batch, and the name-set
    offset keeps growing monotonically (the restart-safety invariant)
    rather than resetting between batches."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import register

    n_files, cap = 1000, 100
    base = tempfile.mkdtemp(prefix=f"ocfstress_{uuid.uuid4().hex[:8]}_")
    land, chk = f"{base}/land", f"{base}/chk"
    for i in range(n_files):
        write_avro_ocf(
            f"{land}/part-{i:05d}.avro",
            [{**ROWS[0], "doc_id": 10_000 + i}],
            SCHEMA,
        )
    register(spark)
    batches: list[list[int]] = []

    def body(df, _eid):
        ids = [r["doc_id"] for r in df.collect()]
        if ids:
            batches.append(sorted(ids))

    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .option("maxFilesPerBatch", str(cap))
        .load()
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    flat = sorted(x for b in batches for x in b)
    assert flat == list(range(10_000, 10_000 + n_files))  # exactly once
    assert all(len(b) <= cap for b in batches)            # cap per batch
    assert len(batches) >= n_files // cap                 # really capped


def test_manifest_lock_serializes_cooperating_writers(tmp_path):
    """Local-FS commits run under a real O_EXCL lock: 8 threads
    publishing concurrently must each land their part with NO retries
    exhausted, and the version must count every commit exactly once
    (true serialization, not detect-and-repair luck)."""
    import threading

    from kafka_avro_order_processing_spark.sources import avro_ocf as mod

    path = str(tmp_path / "lake")
    os.makedirs(path)
    errors: list[Exception] = []

    def commit(i: int) -> None:
        try:
            mod._publish_manifest(
                path,
                lambda cur: {**cur, "parts": sorted(
                    set(cur.get("parts", [])) | {f"part-{i:02d}.avro"})},
            )
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=commit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    final = mod._read_manifest(path)
    assert final["parts"] == [f"part-{i:02d}.avro" for i in range(8)]
    assert final["version"] == 8  # one increment per commit, none lost
    assert not os.path.exists(mod._local_lock_path(path))  # released


def test_manifest_lock_breaks_stale_holder(tmp_path):
    """A lock file left by a crashed writer (old mtime) is broken and
    the commit proceeds instead of timing out."""
    import time

    from kafka_avro_order_processing_spark.sources import avro_ocf as mod

    path = str(tmp_path / "lake")
    os.makedirs(path)
    lp = mod._local_lock_path(path)
    with open(lp, "w") as f:
        f.write("99999")
    old = time.time() - 3600
    os.utime(lp, (old, old))
    out = mod._publish_manifest(path, lambda cur: {**cur, "parts": ["p.avro"]})
    assert out["parts"] == ["p.avro"]
    assert not os.path.exists(lp)


def test_manifest_lock_times_out_on_live_holder(tmp_path):
    """A FRESH lock held by a live writer makes the publish raise the
    documented RuntimeError after the bounded wait — no silent
    lock-break of an active commit."""
    from kafka_avro_order_processing_spark.sources import avro_ocf as mod

    path = str(tmp_path / "lake")
    os.makedirs(path)
    with open(mod._local_lock_path(path), "w") as f:
        f.write("1")
    with pytest.raises(RuntimeError, match="manifest lock"):
        with mod._manifest_lock(path, timeout=0.2):
            pass


# ---------------------------------------------------------------------------
# Time travel: per-version snapshot manifests + read_avro_ocf(version=)
# ---------------------------------------------------------------------------


def test_time_travel_reads_each_committed_version(spark, tmp_path):
    """Every successful publish writes an immutable _manifest.v{N}.json
    snapshot; read_avro_ocf(version=N) sees exactly that commit's part
    set — across appends AND an overwrite that replaced everything."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        manifest_history,
        register,
    )

    register(spark)
    uri = f"file://{tmp_path}/lake"

    def latest():
        return manifest_history(uri)[-1]["version"]

    spark.createDataFrame([(1, "a")], "k long, s string").write.format(
        "kaop_avro"
    ).option("path", uri).mode("append").save()
    v1 = latest()
    spark.createDataFrame([(2, "b")], "k long, s string").write.format(
        "kaop_avro"
    ).option("path", uri).mode("append").save()
    v2 = latest()
    spark.createDataFrame([(9, "z")], "k long, s string").write.format(
        "kaop_avro"
    ).option("path", uri).option("retainHistory", "true").mode(
        "overwrite"
    ).save()
    v3 = latest()

    versions = [h["version"] for h in manifest_history(uri)]
    assert versions == sorted(versions) and v1 < v2 < v3

    def rows_at(v):
        return sorted(
            tuple(r) for r in read_avro_ocf(spark, uri, version=v).collect()
        )

    assert rows_at(v1) == [(1, "a")]
    assert rows_at(v2) == [(1, "a"), (2, "b")]
    assert rows_at(v3) == [(9, "z")]
    # current read == latest version read
    assert rows_at(v3) == sorted(
        tuple(r) for r in read_avro_ocf(spark, uri).collect()
    )
    with pytest.raises(ValueError, match="no snapshot"):
        read_avro_ocf(spark, uri, version=999999).collect()


def test_vacuum_bounds_time_travel_but_keeps_current(spark, tmp_path):
    """vacuum ages out old snapshots under the same grace as their
    orphaned parts (a snapshot outliving its parts would promise reads
    it cannot deliver); the CURRENT version's snapshot survives any
    grace, so the live table stays time-travelable to itself."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        manifest_history,
        register,
        vacuum_avro_dir,
    )

    register(spark)
    uri = f"file://{tmp_path}/lake"
    spark.createDataFrame([(1, "a")], "k long, s string").write.format(
        "kaop_avro"
    ).option("path", uri).mode("append").save()
    spark.createDataFrame([(9, "z")], "k long, s string").write.format(
        "kaop_avro"
    ).option("path", uri).option("retainHistory", "true").mode(
        "overwrite"
    ).save()
    old_versions = [h["version"] for h in manifest_history(uri)][:-1]
    assert old_versions

    deleted = vacuum_avro_dir(uri, grace_seconds=0.0)
    assert any(n.startswith("_manifest.v") for n in deleted)
    hist = {h["version"] for h in manifest_history(uri)}
    assert all(v not in hist for v in old_versions)
    # current state: still readable, still time-travelable to itself
    cur = sorted(tuple(r) for r in read_avro_ocf(spark, uri).collect())
    assert cur == [(9, "z")]
    latest = max(hist)
    assert (
        sorted(
            tuple(r)
            for r in read_avro_ocf(spark, uri, version=latest).collect()
        )
        == cur
    )
    with pytest.raises(ValueError, match="no snapshot"):
        read_avro_ocf(spark, uri, version=old_versions[0]).collect()


def test_datasource_version_as_of_option(spark, tmp_path):
    """spark.read.format('kaop_avro').option('versionAsOf', N) is the
    DataSource form of read_avro_ocf(version=N): same snapshot part
    set, agreeing answers; statsPruning silently downgrades (the stats
    index describes the CURRENT manifest); streams reject the option
    loudly."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        manifest_history,
        register,
    )

    register(spark)
    uri = f"file://{tmp_path}/lake"
    spark.createDataFrame([(1, "a")], "k long, s string").write.format(
        "kaop_avro"
    ).option("path", uri).mode("append").save()
    v1 = manifest_history(uri)[-1]["version"]
    spark.createDataFrame([(2, "b")], "k long, s string").write.format(
        "kaop_avro"
    ).option("path", uri).mode("append").save()

    at_v1 = sorted(
        tuple(r)
        for r in spark.read.format("kaop_avro")
        .option("path", uri)
        .option("versionAsOf", str(v1))
        .load()
        .collect()
    )
    assert at_v1 == [(1, "a")]
    assert at_v1 == sorted(
        tuple(r) for r in read_avro_ocf(spark, uri, version=v1).collect()
    )
    # pruning option + versionAsOf: still correct (plain-reader path)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pruned = sorted(
        tuple(r)
        for r in spark.read.format("kaop_avro")
        .option("path", uri)
        .option("versionAsOf", str(v1))
        .option("statsPruning", "true")
        .load()
        .collect()
    )
    assert pruned == at_v1
    # stream readers are built lazily — the rejection surfaces when the
    # query actually starts, not at load()
    sdf = (
        spark.readStream.format("kaop_avro")
        .option("path", uri)
        .option("versionAsOf", str(v1))
        .load()
    )
    with pytest.raises(Exception, match="versionAsOf"):
        q = (
            sdf.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


# ---------------------------------------------------------------------------
# Targeted deletion (delete_where_avro_dir)
# ---------------------------------------------------------------------------


def _land_clustered_orders(spark, uri, n=600):
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        write_avro_clustered,
    )

    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("long").alias("u"),
        F.concat(F.lit("row"), F.col("id").cast("string")).alias("s"),
    )
    write_avro_clustered(
        df, uri, cluster_by=["k"], num_parts=6,
        bloom_columns=("u",), max_records_per_part=100,
    )
    return df


def test_delete_where_removes_exactly_matching_rows(spark, tmp_path):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        delete_where_avro_dir,
    )
    from pyspark.sql import functions as F2

    uri = f"file://{tmp_path}/lake"
    df = _land_clustered_orders(spark, uri)
    stats = delete_where_avro_dir(
        spark, uri, "u = 3", prune_filter=[["u", "=", 3]]
    )
    want = sorted(
        (r["k"], r["u"], r["s"])
        for r in df.filter(F2.col("u") != 3).collect()
    )
    got = sorted(
        (r["k"], r["u"], r["s"]) for r in read_avro_ocf(spark, uri).collect()
    )
    assert got == want
    assert stats["rows_deleted"] == df.filter(F2.col("u") == 3).count()
    # kept + deleted == rows scanned across the affected parts
    assert stats["rows_kept"] + stats["rows_deleted"] <= df.count()


def test_delete_where_prunes_unaffected_parts(spark, tmp_path):
    # k is range-clustered: a delete keyed on a narrow k range must
    # rewrite only the parts whose min/max admit it.
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        delete_where_avro_dir,
    )

    uri = f"file://{tmp_path}/lake"
    df = _land_clustered_orders(spark, uri)
    stats = delete_where_avro_dir(
        spark, uri, "k >= 10 AND k < 20",
        prune_filter=[["k", ">=", 10], ["k", "<", 20]],
    )
    assert stats["rows_deleted"] == 10
    assert 0 < stats["parts_rewritten"] < stats["parts_total"]
    remaining = read_avro_ocf(spark, uri).count()
    assert remaining == df.count() - 10


def test_delete_where_null_predicate_rows_are_kept(spark, tmp_path):
    # SQL DELETE semantics: NULL predicate -> row kept, not deleted.
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        delete_where_avro_dir,
        register,
    )

    register(spark)
    uri = f"file://{tmp_path}/lake"
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k long, v long"
    )
    df.write.format("kaop_avro").option("path", uri).mode("append").save()
    stats = delete_where_avro_dir(spark, uri, "v > 15")
    got = sorted((r["k"], r["v"]) for r in read_avro_ocf(spark, uri).collect())
    assert got == [(1, 10), (2, None)]
    assert stats["rows_deleted"] == 1


def test_delete_where_local_classic_dir(spark, tmp_path):
    # plain local (non-manifest) directory: rename-then-remove path.
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        delete_where_avro_dir,
        register,
    )

    register(spark)
    base = str(tmp_path / "classic")
    df = spark.createDataFrame([(i, i % 3) for i in range(90)], "k long, u long")
    df.write.format("kaop_avro").option("path", base).mode("append").save()
    stats = delete_where_avro_dir(spark, base, "u = 1")
    got = sorted(r["k"] for r in read_avro_ocf(spark, base).collect())
    assert got == [i for i in range(90) if i % 3 != 1]
    assert stats["rows_deleted"] == 30


def test_delete_where_retain_history_enables_time_travel(spark, tmp_path):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        delete_where_avro_dir,
        manifest_history,
    )

    uri = f"file://{tmp_path}/lake"
    df = _land_clustered_orders(spark, uri)
    v_before = manifest_history(uri)[-1]["version"]
    delete_where_avro_dir(
        spark, uri, "u = 0", prune_filter=[["u", "=", 0]],
        retain_history=True,
    )
    # pre-delete version still fully readable
    at_before = read_avro_ocf(spark, uri, version=v_before).count()
    assert at_before == df.count()
    # current state has the rows gone
    assert read_avro_ocf(spark, uri).count() < at_before


# ---------------------------------------------------------------------------
# MERGE INTO (merge_into_avro_dir)
# ---------------------------------------------------------------------------


def test_merge_into_upserts_and_inserts(spark, tmp_path):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        merge_into_avro_dir,
    )

    uri = f"file://{tmp_path}/lake"
    df = _land_clustered_orders(spark, uri, n=200)
    updates = spark.createDataFrame(
        [(5, 99, "patched5"), (17, 99, "patched17"), (1000, 99, "new1000")],
        "k long, u long, s string",
    )
    stats = merge_into_avro_dir(spark, uri, updates, ["k"])
    got = {
        r["k"]: (r["u"], r["s"]) for r in read_avro_ocf(spark, uri).collect()
    }
    assert got[5] == (99, "patched5") and got[17] == (99, "patched17")
    assert got[1000] == (99, "new1000")
    assert len(got) == 201  # 200 originals, 2 replaced in place, 1 new
    assert got[6] == (6 % 7, "row6")  # untouched rows intact
    assert stats["rows_matched"] == 2 and stats["rows_inserted"] == 1
    # auto-prune: only the parts admitting keys {5, 17, 1000} rewrote
    assert 0 < stats["parts_rewritten"] < stats["parts_total"]


def test_merge_into_rejects_duplicate_update_keys(spark, tmp_path):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        merge_into_avro_dir,
    )

    uri = f"file://{tmp_path}/lake"
    _land_clustered_orders(spark, uri, n=50)
    dup = spark.createDataFrame(
        [(5, 1, "a"), (5, 2, "b")], "k long, u long, s string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into_avro_dir(spark, uri, dup, ["k"])


def test_merge_into_rejects_schema_mismatch(spark, tmp_path):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        merge_into_avro_dir,
    )

    uri = f"file://{tmp_path}/lake"
    _land_clustered_orders(spark, uri, n=50)
    wrong = spark.createDataFrame([(5, 1)], "k long, u long")
    with pytest.raises(ValueError, match="columns"):
        merge_into_avro_dir(spark, uri, wrong, ["k"])


def test_merge_into_local_classic_dir(spark, tmp_path):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        merge_into_avro_dir,
        register,
    )

    register(spark)
    base = str(tmp_path / "classic")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k long, s string"
    ).write.format("kaop_avro").option("path", base).mode("append").save()
    updates = spark.createDataFrame(
        [(3, "patched"), (100, "new")], "k long, s string"
    )
    stats = merge_into_avro_dir(spark, base, updates, ["k"])
    got = {r["k"]: r["s"] for r in read_avro_ocf(spark, base).collect()}
    assert got[3] == "patched" and got[100] == "new" and got[0] == "v0"
    assert len(got) == 41
    assert stats["rows_matched"] == 1 and stats["rows_inserted"] == 1


def test_merge_into_retain_history_time_travel(spark, tmp_path):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        manifest_history,
        merge_into_avro_dir,
    )

    uri = f"file://{tmp_path}/lake"
    df = _land_clustered_orders(spark, uri, n=100)
    v_before = manifest_history(uri)[-1]["version"]
    updates = spark.createDataFrame(
        [(0, 42, "patched")], "k long, u long, s string"
    )
    merge_into_avro_dir(spark, uri, updates, ["k"], retain_history=True)
    old = {
        r["k"]: r["s"]
        for r in read_avro_ocf(spark, uri, version=v_before).collect()
    }
    assert old[0] == "row0" and len(old) == df.count()
    new = {r["k"]: r["s"] for r in read_avro_ocf(spark, uri).collect()}
    assert new[0] == "patched"


@pytest.mark.slow
def test_row_ops_stateful_fuzz_against_dict_model(spark, tmp_path):
    """Stateful property check: a random interleaving of APPEND /
    MERGE / DELETE ops against the lake must track a plain dict model
    keyed by k — after every op the table's full contents equal the
    model's, exactly."""
    import random

    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        delete_where_avro_dir,
        merge_into_avro_dir,
        register,
    )

    register(spark)
    rnd = random.Random(23)
    for trial in range(3):
        uri = f"file://{tmp_path}/fuzz{trial}"
        model: dict[int, str] = {}

        def append(rows):
            spark.createDataFrame(rows, "k long, s string").write.format(
                "kaop_avro"
            ).option("path", uri).mode("append").save()
            model.update(dict(rows))

        # seed: unique keys so append==upsert initially
        seed = [(k, f"s{k}") for k in rnd.sample(range(100), 30)]
        append(seed)
        for _ in range(4):
            op = rnd.choice(["merge", "delete"])
            if op == "merge":
                ks = rnd.sample(range(120), rnd.randint(1, 8))
                ups = [(k, f"m{rnd.randint(0, 999)}") for k in ks]
                merge_into_avro_dir(
                    spark,
                    uri,
                    spark.createDataFrame(ups, "k long, s string"),
                    ["k"],
                )
                model.update(dict(ups))
            else:
                lo = rnd.randint(0, 110)
                hi = lo + rnd.randint(1, 25)
                delete_where_avro_dir(
                    spark,
                    uri,
                    f"k >= {lo} AND k < {hi}",
                    prune_filter=[["k", ">=", lo], ["k", "<", hi]],
                )
                for k in [k for k in model if lo <= k < hi]:
                    del model[k]
            got = {
                r["k"]: r["s"] for r in read_avro_ocf(spark, uri).collect()
            }
            assert got == model, (trial, op)


def test_full_delete_leaves_readable_empty_table(spark, tmp_path):
    """The manifest carries the writer schema, so a table whose every
    part a DELETE removed reads as an EMPTY frame with the right
    columns — and a subsequent MERGE into the empty table inserts."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        delete_where_avro_dir,
        merge_into_avro_dir,
        register,
    )

    register(spark)
    uri = f"file://{tmp_path}/lake"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, s string"
    ).write.format("kaop_avro").option("path", uri).mode("append").save()
    stats = delete_where_avro_dir(spark, uri, "k >= 0")
    assert stats["rows_deleted"] == 2 and stats["rows_kept"] == 0

    empty = read_avro_ocf(spark, uri)
    assert empty.columns == ["k", "s"]
    assert empty.count() == 0
    # DataSource path agrees
    ds = spark.read.format("kaop_avro").option("path", uri).load()
    assert ds.columns == ["k", "s"] and ds.count() == 0

    merge_into_avro_dir(
        spark,
        uri,
        spark.createDataFrame([(7, "z")], "k long, s string"),
        ["k"],
    )
    assert [tuple(r) for r in read_avro_ocf(spark, uri).collect()] == [
        (7, "z")
    ]


def test_diff_versions_reports_parts_and_exact_rows(spark, tmp_path):
    """The commit-diff audit: appends add parts, overwrite replaces
    them; row totals come from the snapshots' own stats, exactly."""
    import pytest as _pytest

    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        diff_versions,
        manifest_history,
        register,
    )

    register(spark)
    uri = f"file://{tmp_path}/difflake"

    def latest():
        return manifest_history(uri)[-1]["version"]

    spark.createDataFrame(
        [(i, "a") for i in range(4)], "k long, s string"
    ).coalesce(1).write.format("kaop_avro").option("path", uri).mode(
        "append"
    ).save()
    v1 = latest()
    spark.createDataFrame(
        [(i, "b") for i in range(3)], "k long, s string"
    ).coalesce(1).write.format("kaop_avro").option("path", uri).mode(
        "append"
    ).save()
    v2 = latest()
    spark.createDataFrame([(99, "z")], "k long, s string").coalesce(
        1
    ).write.format("kaop_avro").option("path", uri).option(
        "retainHistory", "true"
    ).mode("overwrite").save()
    v3 = latest()

    d12 = diff_versions(uri, v1, v2)
    assert d12["parts_removed"] == []
    assert len(d12["parts_added"]) >= 1
    assert d12["rows_added"] == 3 and d12["rows_removed"] == 0
    assert (d12["rows_from"], d12["rows_to"]) == (4, 7)
    assert d12["row_delta"] == 3
    assert set(d12["parts_kept"]) <= set(
        d12["parts_kept"] + d12["parts_added"]
    )

    d23 = diff_versions(uri, v2, v3)
    assert d23["parts_kept"] == []          # overwrite replaced everything
    assert d23["rows_removed"] == 7 and d23["rows_to"] == 1
    assert d23["row_delta"] == -6

    # reverse direction just flips the sets
    d21 = diff_versions(uri, v2, v1)
    assert d21["parts_added"] == d12["parts_removed"]
    assert d21["parts_removed"] == d12["parts_added"]
    assert d21["row_delta"] == -3

    # a never-committed version fails loudly, like version reads
    with _pytest.raises(ValueError):
        diff_versions(uri, v1, 10**9)
