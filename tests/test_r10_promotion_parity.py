"""Pre-staged r10 promotion oracles (r7 verdict task 3).

Each suite-only operator named by the HANDOFF's promotion queue gets a
DuckDB oracle here, compared through the SAME canonicalization the
grading driver uses (column-sorted, repr-normalized values, plus the
arrow integer-dtype gate) — so promoting any of these to a registry
row at round 10 is a mechanical rename of the SQL string below into
``_register(...)``, with the parity already proven.

Covered: roc_auc, grouped_roc_auc, threshold_for_keep_rate,
percentile_normalize, gopher_quality_flags, c4_line_filters,
oov_stats, temperature_mixture_rates (integer thresholds),
duplicated_ngram_spans, bpe_train merge table, diff_versions deltas.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa_arrow

from test_oracle_parity import SF_DIR, _canon, _duck

_SPARK_INTEGRAL = ("byte", "short", "integer", "long")


def _assert_parity(sdf, sql: str, con: duckdb.DuckDBPyConnection | None = None):
    """The driver's compare, replicated: row count + column names +
    repr-normalized values (column-sorted), plus the arrow dtype gate
    that red-rows HUGEINT/DECIMAL where Spark is integral."""
    con = con or _duck(SF_DIR)
    orows = con.execute(sql).fetchall()
    ocols = [d[0] for d in con.description]

    spark_integral = {
        f.name for f in sdf.schema.fields if f.dataType.typeName() in _SPARK_INTEGRAL
    }
    arrow_schema = con.execute(sql).fetch_arrow_table().schema
    bad = [
        (c, str(arrow_schema.field(c).type))
        for c in spark_integral
        if c in arrow_schema.names
        and not pa_arrow.types.is_integer(arrow_schema.field(c).type)
    ]
    assert not bad, f"oracle columns non-integer where Spark is integral: {bad}"

    s_cols, s_data = _canon(sdf.columns, [tuple(r) for r in sdf.collect()])
    o_cols, o_data = _canon(ocols, orows)
    assert s_cols == o_cols, f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_data) == len(o_data), (
        f"row counts differ: spark={len(s_data)} oracle={len(o_data)}"
    )
    mism = [(a, b) for a, b in zip(s_data, o_data) if a != b]
    assert not mism, f"{len(mism)} mismatching rows; first: {mism[:3]}"


def _scored_lineitem(spark):
    """score = l_quantity (integer-valued, tie-dense), label =
    returned flag — the natural eval frame both engines can derive."""
    from kafka_avro_order_processing_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR, "lineitem")
    return li.select(
        F.col("l_linestatus").alias("g"),
        F.col("l_quantity").alias("s"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )


_SCORED_SQL = (
    "SELECT l_linestatus AS g, l_quantity AS s,"
    " CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem"
)


def test_roc_auc_oracle(spark):
    from kafka_avro_order_processing_spark.operators.eval import roc_auc

    v = roc_auc(_scored_lineitem(spark), "s", "y")
    sdf = spark.createDataFrame([(float(v),)], "auc double")
    # doubled midrank of a tie group: 2*rk + c - 1 == 2*c_lt + c + 1
    _assert_parity(
        sdf,
        f"""
        WITH t AS ({_SCORED_SQL}),
        r AS (
          SELECT y, RANK() OVER (ORDER BY s) AS rk,
                 COUNT(*) OVER (PARTITION BY s) AS c
          FROM t WHERE s IS NOT NULL
        )
        SELECT CAST(CAST(SUM(CASE WHEN y = 1 THEN 2*rk + c - 1 ELSE 0 END)
                         - SUM(y) * (SUM(y) + 1) AS BIGINT) AS DOUBLE)
               / CAST(2 * SUM(y) * (COUNT(*) - SUM(y)) AS DOUBLE) AS auc
        FROM r
        """,
    )


def test_grouped_roc_auc_oracle(spark):
    from kafka_avro_order_processing_spark.operators.eval import grouped_roc_auc

    sdf = grouped_roc_auc(_scored_lineitem(spark), "g", "s", "y")
    _assert_parity(
        sdf,
        f"""
        WITH t AS ({_SCORED_SQL}),
        r AS (
          SELECT g, y, RANK() OVER (PARTITION BY g ORDER BY s) AS rk,
                 COUNT(*) OVER (PARTITION BY g, s) AS c
          FROM t WHERE s IS NOT NULL
        )
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
               CASE WHEN SUM(y) > 0 AND SUM(y) < COUNT(*) THEN
                 CAST(CAST(SUM(CASE WHEN y = 1 THEN 2*rk + c - 1 ELSE 0 END)
                           - SUM(y) * (SUM(y) + 1) AS BIGINT) AS DOUBLE)
                 / CAST(2 * SUM(y) * (COUNT(*) - SUM(y)) AS DOUBLE)
               END AS auc
        FROM r GROUP BY g
        """,
    )


def test_threshold_for_keep_rate_oracle(spark):
    from kafka_avro_order_processing_spark.operators.eval import (
        threshold_for_keep_rate,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("n_chars").cast("double").alias("s")
    )
    t, kept = threshold_for_keep_rate(docs, 0.4, "s")
    sdf = spark.createDataFrame([(float(t), int(kept))], "threshold double, kept bigint")
    _assert_parity(
        sdf,
        """
        WITH t AS (SELECT CAST(n_chars AS DOUBLE) AS s FROM documents
                   WHERE n_chars IS NOT NULL),
        cnt AS (SELECT s, COUNT(*) AS c FROM t GROUP BY s),
        cum AS (SELECT s, c, SUM(c) OVER (ORDER BY s) - c AS c_lt FROM cnt),
        tot AS (SELECT COUNT(*) AS n FROM t),
        thr AS (SELECT MAX(s) AS threshold FROM cum, tot
                WHERE n - c_lt >= CEIL(CAST(0.4 AS DOUBLE) * CAST(n AS DOUBLE))),
        k AS (SELECT CAST(SUM(c) AS BIGINT) AS kept FROM cum, thr
              WHERE cum.s >= thr.threshold)
        SELECT thr.threshold AS threshold, k.kept AS kept FROM thr, k
        """,
    )


def test_percentile_normalize_oracle(spark):
    from kafka_avro_order_processing_spark.operators.eval import percentile_normalize
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sdf = percentile_normalize(docs, "n_chars", group_col="lang").select(
        "doc_id", "pct"
    )
    _assert_parity(
        sdf,
        """
        WITH r AS (
          SELECT doc_id,
                 RANK() OVER (PARTITION BY lang ORDER BY CAST(n_chars AS DOUBLE)) AS rk,
                 COUNT(*) OVER (PARTITION BY lang, n_chars) AS c,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM documents
        )
        SELECT doc_id,
               CAST(2*rk + c - 1 AS DOUBLE) / CAST(2*n AS DOUBLE) AS pct
        FROM r
        """,
    )


def test_gopher_quality_flags_oracle(spark):
    """Thresholds tuned to the short synthetic docs (as in the demo:
    min_words=10, min_mean_word_len=2.0) so flags actually vary."""
    from kafka_avro_order_processing_spark.operators.rules import (
        gopher_quality_flags,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table

    sdf = gopher_quality_flags(
        load_table(spark, SF_DIR, "documents"),
        min_words=10,
        min_mean_word_len=2.0,
    )
    _assert_parity(
        sdf,
        """
        WITH base AS (
          SELECT doc_id,
                 text,
                 list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w,
                 list_filter(regexp_split_to_array(text, '\\n'), l -> trim(l) <> '') AS lines
          FROM documents
        ),
        m AS (
          SELECT doc_id,
            len(w) AS n_words,
            CASE WHEN len(w) > 0 THEN
              CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w)
            END AS mean_wl,
            (length(text) - length(replace(text, '#', ''))) AS n_hash,
            (length(text) - length(replace(text, '...', ''))) / 3 AS n_ellipsis,
            len(lines) AS n_lines,
            len(list_filter(lines, l -> starts_with(trim(l), '-')
                                     OR starts_with(trim(l), '*')
                                     OR starts_with(trim(l), '•'))) AS bullet_lines,
            len(list_filter(lines, l -> ends_with(trim(l), '...'))) AS ellipsis_lines,
            len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
            len(list_filter(w, x -> list_contains(
              ['the','be','to','of','and','that','have','with'], lower(x)))) AS n_stop
          FROM base
        )
        SELECT doc_id,
          CAST(n_words AS BIGINT) AS n_words,
          mean_wl AS mean_word_len,
          COALESCE(n_words >= 10 AND n_words <= 100000, FALSE) AS ok_word_count,
          COALESCE(mean_wl >= 2.0 AND mean_wl <= 10.0, FALSE) AS ok_mean_word_len,
          COALESCE(CASE WHEN n_words > 0 THEN
              CAST(n_hash + n_ellipsis AS DOUBLE) / n_words END <= 0.1,
            FALSE) AS ok_symbol_ratio,
          COALESCE(CASE WHEN n_lines > 0 THEN
              CAST(bullet_lines AS DOUBLE) / n_lines END <= 0.9,
            FALSE) AS ok_bullet_lines,
          COALESCE(CASE WHEN n_lines > 0 THEN
              CAST(ellipsis_lines AS DOUBLE) / n_lines END <= 0.3,
            FALSE) AS ok_ellipsis_lines,
          COALESCE(CASE WHEN n_words > 0 THEN
              CAST(alpha_words AS DOUBLE) / n_words END >= 0.8,
            FALSE) AS ok_alpha_words,
          COALESCE(n_stop >= 2, FALSE) AS ok_stop_words,
          COALESCE(n_words >= 10 AND n_words <= 100000, FALSE)
            AND COALESCE(mean_wl >= 2.0 AND mean_wl <= 10.0, FALSE)
            AND COALESCE(CASE WHEN n_words > 0 THEN
                CAST(n_hash + n_ellipsis AS DOUBLE) / n_words END <= 0.1, FALSE)
            AND COALESCE(CASE WHEN n_lines > 0 THEN
                CAST(bullet_lines AS DOUBLE) / n_lines END <= 0.9, FALSE)
            AND COALESCE(CASE WHEN n_lines > 0 THEN
                CAST(ellipsis_lines AS DOUBLE) / n_lines END <= 0.3, FALSE)
            AND COALESCE(CASE WHEN n_words > 0 THEN
                CAST(alpha_words AS DOUBLE) / n_words END >= 0.8, FALSE)
            AND COALESCE(n_stop >= 2, FALSE) AS keep
        FROM m
        """,
    )


def test_c4_line_filters_oracle(spark):
    """Single-line synthetic docs: require_terminal_punct off (the
    corpus has no punctuation), min_lines=1 — the parameterization a
    promotion row would pin."""
    from kafka_avro_order_processing_spark.operators.rules import c4_line_filters
    from kafka_avro_order_processing_spark.sources.tables import load_table

    sdf = c4_line_filters(
        load_table(spark, SF_DIR, "documents"),
        min_line_words=5,
        min_lines=1,
        require_terminal_punct=False,
    )
    _assert_parity(
        sdf,
        """
        WITH base AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\n'),
                             l -> trim(l) <> '') AS lines
          FROM documents
        ),
        f AS (
          SELECT doc_id,
                 len(lines) AS n_lines,
                 list_filter(lines, l ->
                   len(list_filter(regexp_split_to_array(trim(l), '\\s+'),
                                   x -> x <> '')) >= 5
                   AND NOT contains(lower(trim(l)), 'lorem ipsum')
                   AND NOT contains(lower(trim(l)), '{')
                   AND NOT contains(lower(trim(l)), 'javascript')) AS kept
          FROM base
        )
        SELECT doc_id,
               array_to_string(kept, chr(10)) AS text,
               CAST(len(kept) AS BIGINT) AS n_lines_kept,
               CAST(n_lines - len(kept) AS BIGINT) AS n_lines_dropped
        FROM f WHERE len(kept) >= 1
        """,
    )


def test_oov_stats_oracle(spark):
    """Vocab = distinct corpus words starting a-m (deterministic in
    both engines); per-doc OOV counts and rate."""
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.operators.tokens import (
        encode_ids,
        oov_stats,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, '\\\\s+'), t -> t != '')").alias("tokens"),
    )
    vocab = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("token"))
        .filter("token != '' AND token rlike '^[a-m]'")
        .distinct()
        .withColumn("token_id", (F.crc32("token") % 1_000_000).cast("int"))
    )
    per_doc, _totals = oov_stats(encode_ids(toks, vocab))
    _assert_parity(
        per_doc,
        """
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS token
          FROM documents
        ),
        vocab AS (
          SELECT DISTINCT token FROM tok WHERE regexp_matches(token, '^[a-m]')
        ),
        per AS (
          SELECT t.doc_id,
                 COUNT(*) AS n_tokens,
                 SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
          FROM tok t LEFT JOIN vocab v USING (token)
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
               CASE WHEN COALESCE(p.n_tokens, 0) > 0 THEN
                 CAST(p.n_oov AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)
               END AS oov_rate
        FROM documents d LEFT JOIN per p USING (doc_id)
        """,
    )


def test_temperature_mixture_thresholds_oracle(spark):
    """Integer md5-bucket thresholds only (the float rate's last ulp
    may differ by summation order across engines — the threshold is
    the operative, promotable output).  Bucket space is 2^16 since the
    round-11 widening (mixture.py: tiny rates must not quantize to a
    silent 0)."""
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.operators.mixture import (
        temperature_mixture_rates,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sdf = temperature_mixture_rates(docs, "source", alpha=0.5).select(
        "domain", "n", "threshold"
    )
    _assert_parity(
        sdf,
        """
        WITH c AS (SELECT source AS domain, COUNT(*) AS n
                   FROM documents GROUP BY source),
        p AS (SELECT domain, n, POW(CAST(n AS DOUBLE), CAST(0.5 AS DOUBLE)) AS w
              FROM c),
        s AS (SELECT SUM(w) AS w_sum FROM p),
        wp AS (SELECT domain, n, w / w_sum AS p FROM p, s),
        t AS (SELECT MIN(CAST(n AS DOUBLE) / p) AS t FROM wp)
        SELECT domain, CAST(n AS BIGINT) AS n,
               CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
                                t * p / CAST(n AS DOUBLE)) * 65536) AS BIGINT)
                 AS threshold
        FROM wp, t
        """,
    )


def test_duplicated_ngram_spans_oracle(spark):
    from kafka_avro_order_processing_spark.operators.substr import (
        duplicated_ngram_spans,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table

    sdf = duplicated_ngram_spans(load_table(spark, SF_DIR, "documents"), n=4)
    _assert_parity(
        sdf,
        """
        WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                                     t -> t <> '') AS toks
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i,
                 toks
          FROM toks
        ),
        g AS (
          SELECT doc_id, i - 1 AS pos,
                 array_to_string(list_slice(toks, i, i + 3), ' ') AS gram
          FROM grams
        ),
        dup AS (
          SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
        ),
        pos AS (
          SELECT g.doc_id, g.pos,
                 g.pos - ROW_NUMBER() OVER (PARTITION BY g.doc_id
                                            ORDER BY g.pos) AS island
          FROM g SEMI JOIN dup USING (gram)
        )
        SELECT doc_id,
               CAST(MIN(pos) AS INTEGER) AS span_start,
               CAST(MAX(pos) + 3 AS INTEGER) AS span_end,
               CAST(COUNT(*) AS INTEGER) AS n_grams
        FROM pos GROUP BY doc_id, island
        """,
    )


def _bpe_round_sql(k: int) -> str:
    """One merge round as chained CTEs: pair counts over the wrapped
    symbol strings, deterministic best pick (count desc, left, right),
    then a REPLACE that applies the merge greedily left-to-right
    (non-overlapping string replace == the reference fold: each symbol
    is wrapped in chr(1) on BOTH sides, so boundaries are never shared
    between adjacent matches and 'a a a' under (a,a) -> ['aa','a'])."""
    p = k - 1
    return f"""
        syms_{k} AS (
          SELECT word, n,
                 string_split(substr(symstr, 2, length(symstr) - 2),
                              chr(1) || chr(1)) AS syms
          FROM r{p}
        ),
        pairs_{k} AS (
          SELECT l, r, CAST(SUM(n) AS BIGINT) AS c FROM (
            SELECT n, syms[i] AS l, syms[i + 1] AS r FROM (
              SELECT n, syms,
                     unnest(generate_series(1, greatest(len(syms) - 1, 0))) AS i
              FROM syms_{k})
          ) GROUP BY l, r HAVING SUM(n) >= 2
        ),
        best_{k} AS (SELECT l, r, c FROM pairs_{k}
                     ORDER BY c DESC, l ASC, r ASC LIMIT 1),
        r{k} AS (
          SELECT w.word, w.n,
                 COALESCE(
                   (SELECT replace(w.symstr,
                                   chr(1) || b.l || chr(1) || chr(1) || b.r || chr(1),
                                   chr(1) || b.l || b.r || chr(1))
                    FROM best_{k} b),
                   w.symstr) AS symstr
          FROM r{p} w
        )"""


def _bpe_merge_table_sql(n_merges: int) -> str:
    rounds = ",".join(_bpe_round_sql(k) for k in range(1, n_merges + 1))
    finals = " UNION ALL ".join(
        f"SELECT CAST({k - 1} AS INTEGER) AS rank, l AS \"left\", r AS \"right\","
        f" l || r AS merged, c AS pair_count FROM best_{k}"
        for k in range(1, n_merges + 1)
    )
    return f"""
        WITH wt AS (
          SELECT word, COUNT(*) AS n FROM (
            SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                      t -> t <> '')) AS word
            FROM documents) GROUP BY word
        ),
        r0 AS (
          SELECT word, n,
                 chr(1) || array_to_string(
                   list_append(string_split(word, ''), '</w>'),
                   chr(1) || chr(1)) || chr(1) AS symstr
          FROM wt
        ),
        {rounds}
        SELECT * FROM ({finals}) ORDER BY rank
    """


def test_bpe_merge_table_oracle(spark):
    from kafka_avro_order_processing_spark.operators.bpe import bpe_train
    from kafka_avro_order_processing_spark.sources.tables import load_table

    sdf = bpe_train(load_table(spark, SF_DIR, "documents"), n_merges=6)
    _assert_parity(sdf, _bpe_merge_table_sql(6))


def test_diff_versions_oracle(spark, tmp_path):
    """diff_versions' row deltas, oracled from the SAME snapshot JSONs
    with DuckDB's json reader (json_each over the stats object; part
    names carry dots, so no JSONPath string-splicing).  A promotion
    row would pin the lake dir; here the tmp path is formatted in."""
    from kafka_avro_order_processing_spark.sources.avro_ocf import (
        _SNAPSHOT_FMT,
        diff_versions,
        manifest_history,
        register,
    )

    register(spark)
    uri = f"file://{tmp_path}/difflake"
    spark.createDataFrame(
        [(i, "a") for i in range(4)], "k long, s string"
    ).coalesce(1).write.format("kaop_avro").option("path", uri).mode(
        "append"
    ).save()
    spark.createDataFrame(
        [(i, "b") for i in range(3)], "k long, s string"
    ).coalesce(1).write.format("kaop_avro").option("path", uri).mode(
        "append"
    ).save()
    hist = manifest_history(uri)
    v1, v2 = hist[0]["version"], hist[-1]["version"]

    d = diff_versions(uri, v1, v2)
    sdf = spark.createDataFrame(
        [(
            int(d["v_from"]), int(d["v_to"]),
            len(d["parts_added"]), len(d["parts_removed"]), len(d["parts_kept"]),
            d["rows_added"], d["rows_removed"],
            d["rows_from"], d["rows_to"], d["row_delta"],
        )],
        "v_from long, v_to long, n_parts_added long, n_parts_removed long,"
        " n_parts_kept long, rows_added long, rows_removed long,"
        " rows_from long, rows_to long, row_delta long",
    )

    pa_path = str(tmp_path / "difflake" / _SNAPSHOT_FMT.format(version=v1))
    pb_path = str(tmp_path / "difflake" / _SNAPSHOT_FMT.format(version=v2))
    _assert_parity(
        sdf,
        f"""
        WITH a AS (SELECT json FROM read_json_objects('{pa_path}', format='unstructured')),
        b AS (SELECT json FROM read_json_objects('{pb_path}', format='unstructured')),
        ap AS (SELECT unnest(CAST(json_extract(json, '$.parts') AS VARCHAR[])) AS part FROM a),
        bp AS (SELECT unnest(CAST(json_extract(json, '$.parts') AS VARCHAR[])) AS part FROM b),
        ast AS (SELECT part, CAST(json_extract(json, '/stats/' || part || '/rows')
                              AS BIGINT) AS rows
                FROM (SELECT json, unnest(json_keys(json, '$.stats')) AS part FROM a)),
        bst AS (SELECT part, CAST(json_extract(json, '/stats/' || part || '/rows')
                              AS BIGINT) AS rows
                FROM (SELECT json, unnest(json_keys(json, '$.stats')) AS part FROM b)),
        added AS (SELECT part FROM bp ANTI JOIN ap USING (part)),
        removed AS (SELECT part FROM ap ANTI JOIN bp USING (part)),
        kept AS (SELECT part FROM ap SEMI JOIN bp USING (part)),
        sums AS (
          SELECT
            (SELECT CASE WHEN COUNT(*) FILTER (s.rows IS NULL) = 0
                    THEN CAST(COALESCE(SUM(s.rows), 0) AS BIGINT) END
             FROM added LEFT JOIN bst s USING (part)) AS rows_added,
            (SELECT CASE WHEN COUNT(*) FILTER (s.rows IS NULL) = 0
                    THEN CAST(COALESCE(SUM(s.rows), 0) AS BIGINT) END
             FROM removed LEFT JOIN ast s USING (part)) AS rows_removed,
            (SELECT CASE WHEN COUNT(*) FILTER (s.rows IS NULL) = 0
                    THEN CAST(COALESCE(SUM(s.rows), 0) AS BIGINT) END
             FROM ap LEFT JOIN ast s USING (part)) AS rows_from,
            (SELECT CASE WHEN COUNT(*) FILTER (s.rows IS NULL) = 0
                    THEN CAST(COALESCE(SUM(s.rows), 0) AS BIGINT) END
             FROM bp LEFT JOIN bst s USING (part)) AS rows_to
        )
        SELECT CAST({v1} AS BIGINT) AS v_from, CAST({v2} AS BIGINT) AS v_to,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM added) AS n_parts_added,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM removed) AS n_parts_removed,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_parts_kept,
               rows_added, rows_removed, rows_from, rows_to,
               rows_to - rows_from AS row_delta
        FROM sums
        """,
    )


def test_profile_table_exact_oracle(spark):
    """profile_table(exact=True) over orders — the promotion queue's
    'exact mode' candidate.  data_type strings are Spark
    simpleStrings (constants of the known schema); min/max compare as
    the engines' native->string casts, which agree for bigint,
    non-extreme doubles, strings, and second-precision timestamps."""
    from kafka_avro_order_processing_spark.operators.profile import profile_table
    from kafka_avro_order_processing_spark.sources.tables import load_table

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    sdf = profile_table(load_table(spark, SF_DIR, "orders"), columns=cols, exact=True)
    types = {
        "o_orderkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    }
    parts = []
    for c in cols:
        parts.append(f"""
        SELECT '{c}' AS "column", '{types[c]}' AS data_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CASE WHEN COUNT(*) > 0 THEN
                 CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               ELSE 0.0 END AS null_frac,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders""")
    _assert_parity(sdf, " UNION ALL ".join(parts))
