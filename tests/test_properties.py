"""Property-based tests (hypothesis) for the operator algebra.

The reference ships no tests (SURVEY.md §5); beyond golden rows and the
DuckDB oracle gate, these check the algebraic invariants that make the
operators safe at scale — partition-count invariance, split
completeness, window/aggregate consistency — on randomized inputs.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.aggregate import product_price_stats
from kafka_avro_order_processing_spark.operators.validate import split_valid_invalid
from kafka_avro_order_processing_spark.operators.windows import running_average

PRODUCTS = ["Laptop", "Mouse", "Keyboard", None]

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),                       # seq
        st.sampled_from(PRODUCTS),                    # product (may be null)
        st.one_of(                                    # price: valid, nonpositive, null
            st.none(),
            st.decimals(min_value=-100, max_value=2000, places=2).map(float),
        ),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[0],
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)



# durations-driven slow set (r12): pure fuzz re-check sweep —
# the fast gate keeps the exact-law and oracle primaries
pytestmark = pytest.mark.slow


def _df(spark, rows):
    return spark.createDataFrame(rows, "seq long, product string, price double")


@given(rows=rows_strategy)
@SETTINGS
def test_split_is_a_partition(spark, rows):
    """valid ∪ invalid == input, disjoint — no record is ever dropped or
    double-routed (the reference's poison-pill guarantee, T5/T7)."""
    df = _df(spark, rows)
    valid, invalid = split_valid_invalid(df, key="product", value="price", id_col=None)
    n, nv, ni = df.count(), valid.count(), invalid.count()
    assert nv + ni == n
    seqs_v = {r["seq"] for r in valid.collect()}
    seqs_i = {r["seq"] for r in invalid.collect()}
    assert seqs_v.isdisjoint(seqs_i)
    assert all(r["price"] is not None and r["price"] > 0 and r["product"] is not None
               for r in valid.collect())


@given(rows=rows_strategy, n_parts=st.integers(1, 5))
@SETTINGS
def test_stats_partition_invariance(spark, rows, n_parts):
    """The aggregate is bit-identical under any repartitioning — the
    decimal-sum determinism claim, tested rather than asserted."""
    clean = [r for r in rows if r[1] is not None and r[2] is not None]
    if not clean:
        return
    df = _df(spark, clean)
    a = sorted(map(tuple, product_price_stats(df).collect()))
    b = sorted(map(tuple, product_price_stats(df.repartition(n_parts)).collect()))
    assert a == b


@given(rows=rows_strategy)
@SETTINGS
def test_running_avg_last_row_equals_group_stats(spark, rows):
    """The running aggregate's final row per key must equal the grouped
    aggregate — streaming update-mode state is the incremental view of
    the batch groupBy (SURVEY.md §7)."""
    clean = [r for r in rows if r[1] is not None and r[2] is not None]
    if not clean:
        return
    df = _df(spark, clean)
    run = running_average(df, key="product", value="price", order_by=("seq",))
    last = {}
    for r in sorted(run.collect(), key=lambda r: r["seq"]):
        last[r["product"]] = r
    stats = {r["product"]: r for r in product_price_stats(df).collect()}
    for product, s in stats.items():
        r = last[product]
        assert r["running_count"] == s["order_count"]
        assert r["running_sum"] == s["price_sum"]
        assert r["running_avg"] == s["average_price"]


# --- MERGE / CDC algebra -------------------------------------------------

_delta_strategy = st.lists(
    st.tuples(
        st.integers(-50, 120),                        # key (some outside target)
        st.text(alphabet="abcxyz", min_size=1, max_size=4),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)


@given(delta=_delta_strategy, split_at=st.integers(0, 30))
@SETTINGS
def test_sequential_merge_equals_batch_merge(spark, delta, split_at):
    """The CDC-sink foundation: for a unique-key delta, applying any
    2-way split sequentially equals one batch MERGE — what makes the
    foreachBatch upsert sink's final table independent of micro-batch
    slicing (generalizes tests/test_streaming_cdc.py's fixed cases)."""
    from kafka_avro_order_processing_spark.operators.upsert import upsert

    target = spark.range(100).select(
        F.col("id").alias("k"), F.lit("orig").alias("s")
    )
    d = spark.createDataFrame(delta, "k long, s string")
    want = {tuple(r) for r in upsert(target, d, "k").collect()}

    cut = min(split_at, len(delta))
    d1, d2 = delta[:cut], delta[cut:]
    stepped = target
    for chunk in (d1, d2):
        if chunk:
            stepped = upsert(
                stepped, spark.createDataFrame(chunk, "k long, s string"), "k"
            )
    got = {tuple(r) for r in stepped.collect()}
    assert got == want


@given(delta=_delta_strategy)
@SETTINGS
def test_merge_is_idempotent(spark, delta):
    """Replay safety of the upsert sink: re-applying the same delta is
    a no-op (at-least-once foreachBatch converges)."""
    from kafka_avro_order_processing_spark.operators.upsert import upsert

    target = spark.range(100).select(
        F.col("id").alias("k"), F.lit("orig").alias("s")
    )
    d = spark.createDataFrame(delta, "k long, s string")
    once = upsert(target, d, "k")
    twice = upsert(once, d, "k")
    assert {tuple(r) for r in once.collect()} == {
        tuple(r) for r in twice.collect()
    }


# ---------------------------------------------------------------------------
# Avro OCF codec: encode/decode round-trip on randomized records over a
# schema exercising every supported shape (no Spark session needed).
# ---------------------------------------------------------------------------

_AVRO_SCHEMA = {
    "type": "record", "name": "Everything",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "f", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": ["null", "bytes"]},
        {"name": "flag", "type": "boolean"},
        {"name": "arr", "type": {"type": "array", "items": ["null", "int"]}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "loc", "type": {"type": "record", "name": "Loc",
                                 "fields": [{"name": "x", "type": "double"},
                                            {"name": "y", "type": ["null", "double"]}]}},
        {"name": "loc2", "type": ["null", "Loc"]},
    ],
}

_avro_record = st.fixed_dictionaries({
    "id": st.integers(-(2 ** 62), 2 ** 62),
    "f": st.floats(allow_nan=False, width=64),
    "s": st.text(max_size=40),
    "b": st.one_of(st.none(), st.binary(max_size=20)),
    "flag": st.booleans(),
    "arr": st.lists(st.one_of(st.none(), st.integers(-(2 ** 31), 2 ** 31 - 1)),
                    max_size=6),
    "m": st.dictionaries(st.text(max_size=8), st.integers(-(2 ** 62), 2 ** 62),
                         max_size=4),
    "kind": st.sampled_from(["A", "B", "C"]),
    "loc": st.fixed_dictionaries({
        "x": st.floats(allow_nan=False, width=64),
        "y": st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    }),
    "loc2": st.one_of(st.none(), st.fixed_dictionaries({
        "x": st.floats(allow_nan=False, width=64),
        "y": st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    })),
})


@settings(max_examples=25, deadline=None)
@given(records=st.lists(_avro_record, min_size=0, max_size=20),
       codec=st.sampled_from(["null", "deflate"]))
def test_ocf_codec_round_trips_any_records(tmp_path_factory, records, codec):
    """Spec-compliance property: ANY records valid under a schema that
    exercises every supported shape (unions incl. named-ref branches,
    nested records, maps, enums, block splits) must round-trip through
    real container bytes bit-exactly."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        parse_ocf,
        write_avro_ocf,
    )

    p = str(tmp_path_factory.mktemp("ocfprop") / "r.avro")
    write_avro_ocf(p, records, _AVRO_SCHEMA, codec=codec, records_per_block=7)
    schema, got = parse_ocf(open(p, "rb").read())
    assert schema == _AVRO_SCHEMA
    assert got == records


# ---------------------------------------------------------------------------
# round 6: union re-resolution property — the value decides the writer
# branch, the first compatible reader branch decides the result
# ---------------------------------------------------------------------------

_BRANCH_VALUES = {
    "null": None,
    "boolean": True,
    "int": 7,
    "long": 2**40,
    "float": 1.5,
    "double": -2.25,
    "string": "héllo",
    "bytes": "héllo".encode(),  # valid UTF-8: bytes->string may promote
}
#: writer kind -> reader kinds it legally resolves against (spec:
#: identity, numeric promotion table, string<->bytes)
_OK = {
    "null": {"null"},
    "boolean": {"boolean"},
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}
_KINDS = sorted(_BRANCH_VALUES)


@settings(max_examples=200, deadline=None)
@given(
    writer_kind=st.sampled_from(_KINDS),
    writer_extra=st.lists(st.sampled_from(_KINDS), max_size=3, unique=True),
    reader_branches=st.lists(st.sampled_from(_KINDS), min_size=1, max_size=4,
                             unique=True),
)
def test_union_resolution_first_compatible_branch_or_error(
    writer_kind, writer_extra, reader_branches
):
    """For ANY writer union containing the datum's branch and ANY
    reader union: resolution succeeds iff some reader branch is
    compatible with the datum's branch, lands on the FIRST such
    branch (promoted), and raises otherwise — never a silent
    pass-through."""
    import pytest as _pytest

    from kafka_avro_order_processing_spark.sources.avro_ocf import resolve_record

    value = _BRANCH_VALUES[writer_kind]
    # the datum's branch FIRST so the value-driven re-match is exact
    # (int/long and float/double values are mutually indistinguishable)
    writer_union = [writer_kind] + [k for k in writer_extra if k != writer_kind]
    w = {"type": "record", "name": "R",
         "fields": [{"name": "v", "type": writer_union}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "v", "type": list(reader_branches)}]}
    compatible = [rk for rk in reader_branches if rk in _OK[writer_kind]]
    if not compatible:
        with _pytest.raises(ValueError):
            resolve_record({"v": value}, w, r)
        return
    got = resolve_record({"v": value}, w, r)["v"]
    target = compatible[0]
    if value is None:
        assert got is None
    elif target in ("float", "double"):
        assert got == float(value) and isinstance(got, float)
    elif target in ("int", "long"):
        assert got == int(value) and isinstance(got, int)
    elif writer_kind == "string" and target == "bytes":
        assert got == value.encode("utf-8")
    elif writer_kind == "bytes" and target == "string":
        assert got == value.decode("utf-8")
    else:
        assert got == value


# --------------------------------------------------------------------------
# bloom-filter stats: no false negatives, ever (the property file
# skipping's correctness rests on), for any int or str value set
# --------------------------------------------------------------------------

_bloom_values = st.one_of(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=1, max_size=300),
    st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=300),
)


@given(values=_bloom_values)
@settings(max_examples=60, deadline=None)
def test_bloom_never_false_negative(values):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        _bloom_build,
        _bloom_may_contain,
    )

    bl = _bloom_build(values)
    assert bl is not None
    assert all(_bloom_may_contain(bl, v) for v in values)
    # and it serializes through the JSON the stats plumbing uses
    import json

    bl2 = json.loads(json.dumps(bl))
    assert all(_bloom_may_contain(bl2, v) for v in values)


# --------------------------------------------------------------------------
# file-skipping soundness: whenever _file_may_match prunes a part, NO
# record in it satisfies the filter conjunction under SQL semantics —
# for any record set and any supported filter combination
# --------------------------------------------------------------------------

def _sql_sat(rec, f):
    """SQL-semantics evaluation of one pushed filter on one record:
    comparisons with NULL are not-true, Not(EqualTo) on NULL is
    not-true (three-valued logic collapses to 'row not selected')."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
        LessThan, LessThanOrEqual, Not, StringStartsWith,
    )

    if isinstance(f, Not):
        v = rec.get(f.child.attribute[0])
        return v is not None and v != f.child.value
    v = rec.get(f.attribute[0])
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return False
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    if isinstance(f, In):
        return v in f.value
    if isinstance(f, StringStartsWith):
        return isinstance(v, str) and v.startswith(f.value)
    raise AssertionError(f"unhandled filter {f!r}")


_int_or_null = st.one_of(st.none(), st.integers(-50, 50))
_str_or_null = st.one_of(st.none(), st.text("abcxyz", min_size=0, max_size=4))
_record = st.fixed_dictionaries({"a": _int_or_null, "b": _str_or_null})


def _filters_strategy():
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
        LessThan, LessThanOrEqual, Not, StringStartsWith,
    )

    ints = st.integers(-60, 60)
    strs = st.text("abcxyz", min_size=0, max_size=4)

    def typed(col, lit):
        return st.one_of(
            st.builds(EqualTo, st.just((col,)), lit),
            st.builds(GreaterThan, st.just((col,)), lit),
            st.builds(GreaterThanOrEqual, st.just((col,)), lit),
            st.builds(LessThan, st.just((col,)), lit),
            st.builds(LessThanOrEqual, st.just((col,)), lit),
            st.builds(In, st.just((col,)), st.lists(lit, min_size=1, max_size=4).map(tuple)),
            st.builds(IsNull, st.just((col,))),
            st.builds(IsNotNull, st.just((col,))),
            st.builds(lambda c, v: Not(EqualTo(c, v)), st.just((col,)), lit),
        )

    per_filter = st.one_of(
        typed("a", ints),
        typed("b", strs),
        st.builds(StringStartsWith, st.just(("b",)), strs.filter(len)),
    )
    return st.lists(per_filter, min_size=1, max_size=4)


@given(records=st.lists(_record, min_size=1, max_size=25),
       filters=_filters_strategy())
@settings(max_examples=300, deadline=None)
def test_file_skipping_never_prunes_a_matching_part(records, filters):
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        _file_may_match,
        _stat_filter_supported,
        collect_stats,
    )

    filters = [f for f in filters if _stat_filter_supported(f)]
    if not filters:
        return
    stats = collect_stats(records, ["a", "b"], bloom_cols={"a", "b"})
    if not _file_may_match(stats, filters):
        # pruned -> PROVE no record satisfies the conjunction
        for rec in records:
            assert not all(_sql_sat(rec, f) for f in filters), (
                rec, filters, stats,
            )


@given(records=st.lists(_record, min_size=1, max_size=40),
       cap=st.integers(1, 15))
@settings(max_examples=80, deadline=None)
def test_chunked_part_stats_fold_to_whole_set_stats(records, cap):
    """maxRecordsPerPart splits a task's rows into several parts; the
    split parts' stats must FOLD back to the unsplit stats (min of
    mins, max of maxes, sums of nulls/rows) — the invariant any
    directory-level stats consumer (compaction planning, pruning over
    many small parts) silently relies on."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        _chunked,
        collect_stats,
    )

    whole = collect_stats(records, ["a", "b"])
    parts = [collect_stats(c, ["a", "b"]) for c in _chunked(records, cap)]
    assert sum(p["rows"] for p in parts) == whole["rows"] == len(records)
    for col in ("a", "b"):
        assert sum(p["cols"][col]["nulls"] for p in parts) == whole["cols"][col]["nulls"]
        mins = [p["cols"][col]["min"] for p in parts if "min" in p["cols"][col]]
        maxs = [p["cols"][col]["max"] for p in parts if "max" in p["cols"][col]]
        if "min" in whole["cols"][col]:
            assert min(mins) == whole["cols"][col]["min"]
            assert max(maxs) == whole["cols"][col]["max"]
        # a column unorderable as a whole can still be orderable per
        # chunk (the offending value may land elsewhere) — but never
        # may a chunk CONTRADICT the whole-set range
        for p in parts:
            ent = p["cols"][col]
            if "min" in ent and "min" in whole["cols"][col]:
                assert whole["cols"][col]["min"] <= ent["min"]
                assert ent["max"] <= whole["cols"][col]["max"]
