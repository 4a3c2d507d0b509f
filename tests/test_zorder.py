"""Z-order (Morton) clustered writes: per-part stats must be tight on
EVERY zorder column, so range filters on any of them skip files —
demonstrated head-to-head against lexicographic clustering, whose
second column prunes (almost) nothing.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

from kafka_avro_order_processing_spark.sources import avro_ocf as mod

N_PARTS = 16


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    df = spark.range(4096).selectExpr(
        "id", "CAST(id % 97 AS BIGINT) AS a", "CAST((id * 31) % 89 AS BIGINT) AS b"
    )
    zdir, ldir = str(base / "z"), str(base / "lex")
    mod.write_avro_zordered(df, zdir, ["a", "b"], num_parts=N_PARTS)
    mod.write_avro_clustered(df, ldir, ["a", "b"], num_parts=N_PARTS)
    return df, zdir, ldir


def _survivors(path, filters):
    files = sorted(glob.glob(path + "/*.avro"))
    assert len(files) == N_PARTS
    return sum(
        1 for f in files if mod._file_may_match(mod._header_stats(f), filters)
    )


def _band(col, lo, hi):
    return [GreaterThanOrEqual((col,), lo), LessThanOrEqual((col,), hi)]


def test_zorder_prunes_on_both_columns(dirs):
    _, zdir, _ = dirs
    # a narrow band on EITHER column must kill most parts
    assert _survivors(zdir, _band("a", 10, 15)) <= N_PARTS // 2
    assert _survivors(zdir, _band("b", 10, 15)) <= N_PARTS // 2


def test_lexicographic_prunes_leading_column_only(dirs):
    _, _, ldir = dirs
    # leading column: tight slices, most parts die
    assert _survivors(ldir, _band("a", 10, 15)) <= N_PARTS // 4
    # second column: every part spans nearly the full b-range — this
    # is the failure mode zorder exists to fix
    assert _survivors(ldir, _band("b", 10, 15)) >= N_PARTS - 2


def test_zordered_read_is_correct(spark, dirs):
    df, zdir, _ = dirs
    got = (
        spark.read.format("kaop_avro").option("path", zdir)
        .option("statsPruning", "true").load()
        .filter("a >= 10 AND a <= 15")
    )
    want = df.filter("a >= 10 AND a <= 15")
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_zorder_expr_validation(spark):
    df = spark.range(10).selectExpr("id", "id AS a")
    with pytest.raises(ValueError, match=">= 2"):
        mod.zorder_expr(df, ["a"])
    with pytest.raises(ValueError, match="no such columns"):
        mod.write_avro_zordered(df, "/tmp/x", ["a", "nope"])


def test_constant_column_degrades_gracefully(spark, tmp_path):
    # a constant zorder column contributes level 0 everywhere; the
    # write must still succeed and the other column must still prune
    df = spark.range(1024).selectExpr(
        "id", "CAST(id % 61 AS BIGINT) AS a", "CAST(7 AS BIGINT) AS c"
    )
    d = str(tmp_path / "const")
    mod.write_avro_zordered(df, d, ["a", "c"], num_parts=8)
    files = sorted(glob.glob(d + "/*.avro"))
    assert len(files) == 8
    alive = sum(
        1
        for f in files
        if mod._file_may_match(mod._header_stats(f), _band("a", 5, 9))
    )
    assert alive <= 4
