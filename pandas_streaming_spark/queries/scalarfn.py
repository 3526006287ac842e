"""Q31–Q37: scalar function surface — string, like/case, date/time, math,
JSON, array higher-order functions (SURVEY.md §2.8).

Cross-engine typing rules used throughout: length/size/ceil/floor/
levenshtein/datediff are cast to BIGINT on both sides (Spark ints vs
duckdb BIGINT/DOUBLE); dates travel as formatted strings; array folds use
the double-promotion pattern from functions/ so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.functions import vec_dot


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q31_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("up_name"),
            F.lower("p_brand").alias("lo_brand"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_sub"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
            F.size(F.split("p_name", " ")).cast("long").alias("n_tokens"),
            F.lpad("p_brand", 10, "*").alias("brand_pad"),
            F.reverse("p_name").alias("rev_name"),
            F.levenshtein("p_name", F.lit("widget")).cast("long").alias("lev_widget"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


def q32_like_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    bucket = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 25, "medium")
        .otherwise("large")
    )
    return (
        p.select(
            bucket.alias("size_bucket"),
            F.col("p_type").like("PROMO%").cast("int").alias("is_promo"),
        )
        .groupBy("size_bucket", "is_promo")
        .agg(F.count("*").alias("n"))
        .orderBy("size_bucket", "is_promo")
    )


def q33_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.min(F.col("l_shipdate").cast("date")),
            )
            .cast("long")
            .alias("ship_span_days"),
        )
        .orderBy("yr", "mo")
    )


def q34_date_trunc_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming tumbling window (Q43 grades the replay
    against this exact shape)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.hour("ts").alias("hr"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("day", "hr", "event_type")
    )


def q35_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_extendedprice"), 2).alias("sqrt_price"),
            F.ceil(F.col("l_discount") * 100).cast("long").alias("ceil_disc"),
            F.floor(F.col("l_tax") * 100).cast("long").alias("floor_tax"),
            F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
            F.round(F.abs(F.col("l_discount") - 0.05), 2).alias("abs_disc"),
            (F.col("l_quantity").cast("int") % 7).alias("mod7"),
            F.round(F.log("l_extendedprice"), 4).alias("ln_price"),
        )
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic
        # fixtures (dup groups from key 0 up), so a 2-column sort +
        # LIMIT is under-determined at a tie straddling the cut — caught
        # by the round-7 10x axis after six lucky rounds. Sorting on the
        # full output tuple makes the cut total: rows identical in every
        # graded column are interchangeable by construction.
        .orderBy(
            "l_orderkey", "l_linenumber", "sqrt_price", "ceil_disc",
            "floor_tax", "qty_sq", "abs_disc", "mod7", "ln_price",
        )
        .limit(100)
    )


def q36_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_big"),
        )
        .orderBy("event_type")
    )


def q37_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.round(F.sqrt(vec_dot("embedding", "embedding")), 2).alias("l2_norm"),
            F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_dim"),
            F.round(F.array_max("embedding").cast("double"), 4).alias("max_dim"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


def q65_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return (
        e.select(
            "event_id",
            F.element_at(m, "type").alias("type_val"),
            F.size(m).cast("long").alias("n_keys"),
            F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_str"),
        )
        .orderBy("event_id")
        .limit(100)
    )


def q66_hash_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.md5("p_name").alias("name_md5"),
            F.sha2("p_name", 256).alias("name_sha256"),
            F.md5(F.concat_ws("|", "p_brand", "p_name")).alias("brand_name_md5"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


def q67_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    nullable = F.nullif(F.col("l_quantity").cast("int") % 3, F.lit(0))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.coalesce(nullable, F.lit(-1)).alias("mod3_or_neg1"),
            F.isnull(nullable).cast("int").alias("is_null_flag"),
            F.when(F.col("l_discount") > 0.05, "high")
            .when(F.col("l_discount") > 0.02, "mid")
            .otherwise("low")
            .alias("disc_bucket"),
            F.round(F.greatest("l_tax", "l_discount"), 2).alias("max_rate"),
            F.round(F.least("l_tax", "l_discount"), 2).alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


def q162_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured path (parse_json /
    variant_get) — the schema-on-read twin of q36's typed from_json:
    props parses to an open VARIANT once, fields are extracted with
    typed paths at query time (both JVM-side, no Python). At corpus
    scale this is the pattern for heterogeneous metadata columns where
    a fixed struct schema would churn. duckdb oracle re-derives the
    same fields with its JSON extraction."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.parse_json("props").alias("p"),
    ).select(
        "event_type",
        F.try_variant_get(F.col("p"), "$.k", "int").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
        .orderBy("event_type")
    )


def q164_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* arithmetic (§2.8 error-handling family):
    ``try_divide`` nulls division-by-zero instead of aborting the job
    (this session runs ANSI mode, so plain ``/`` on a zero denominator
    is a hard error at 100 TB — on row 3 billion), ``try_add`` nulls
    int64 overflow, ``try_to_number`` nulls unparseable strings. Counts
    and guarded aggregates per event_type; the duckdb oracle re-derives
    every null with explicit CASE guards, so the try-semantics are
    graded, not just exercised.

    Scale note, measured the hard way: TRY evaluation is
    exception-BASED on its failure path — a thrown-and-caught JVM
    exception per failing row. With overflow on EVERY row the 100x
    probe read 30x growth (~10 us/row); with the realistic shape —
    guards against RARE poison rows (~0.1 % here) — the same query is
    scan-bound. try_* is armor for the odd bad record, not a vectorized
    branch; if the common case fails, restructure the expression."""
    e = _t(spark, sf_dir, "events")
    den = (F.col("user_id") % 5).cast("long")
    # overflow only the ~0.1% "poison" rows (event_id % 997 == 0 hits
    # at every SF; user_id-keyed predicates miss the small fixtures)
    big = F.when(F.pmod(F.col("event_id"), F.lit(997)) == 0,
                 F.lit(9223372036854775807)).otherwise(F.lit(0)).cast("long")
    # NULLIF the no-match empty string first: try_to_number('') takes the
    # per-row exception path internally (measured 30x growth at 100x —
    # 98s for 10M rows); try_to_number(NULL) is the fast path and the
    # TRY semantics under grade are unchanged
    parsed = F.try_to_number(
        F.nullif(F.regexp_extract("props", r'"k": (\d+)', 1), F.lit("")),
        F.lit("99999"),
    )
    t = e.select(
        "event_type",
        F.try_divide(F.col("value"), den).alias("ratio"),
        F.try_add(big, F.when(F.col("user_id") > 0, F.col("user_id"))
                  .otherwise(F.lit(0))).alias("ov"),
        parsed.alias("k_num"),
    )
    return (
        t.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.count("*") - F.count("ratio")).cast("long").alias("n_div_null"),
            (F.count("*") - F.count("ov")).cast("long").alias("n_overflow"),
            F.round(F.sum("ratio"), 2).alias("sum_ratio"),
            F.sum("k_num").cast("long").alias("sum_k"),
        )
        .orderBy("event_type")
    )


def q167_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (§2.6/§3 decorrelation surface beyond
    q68/q69's scalar+EXISTS): per nation, its top-2 customers by account
    balance via ``LATERAL (... ORDER BY ... LIMIT 2)`` — the per-row
    dependent subquery Catalyst decorrelates into a ranked join rather
    than executing N times. duckdb runs the same LATERAL SQL."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("__n_q167")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__c_q167")
    return spark.sql("""
SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 2) AS acctbal
FROM __n_q167 n,
LATERAL (
  SELECT c_name, c_acctbal FROM __c_q167
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
ORDER BY n.n_name, acctbal DESC, t.c_name
""")


def q168_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM) — a
    distinct join-semantics surface the plain family (q03–q10) never
    exercises: rows whose join key is NULL pair with each other instead
    of vanishing. The nullable key is the JSON props field (absent on a
    fraction of events); a per-key dim of counts joins back null-safely,
    so the NULL-key group must survive with its dim count attached —
    under a plain equi-join those rows would drop and the oracle
    (IS NOT DISTINCT FROM) would mismatch."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    dim = e.groupBy(F.col("k").alias("dk")).agg(F.count("*").alias("k_count"))
    joined = e.join(dim, F.col("k").eqNullSafe(F.col("dk")), "inner")
    return (
        joined.groupBy("k")
        .agg(
            F.count("*").alias("n_rows"),
            F.max("k_count").cast("long").alias("k_count"),
        )
        .orderBy(F.col("k").asc_nulls_first())
    )


def q169_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV-string parsing (``from_csv`` — the §2.1 text-format surface
    as a column expression, the way log lines arrive off a queue): a
    deterministic CSV line is rendered from the order columns, then
    parsed BACK through from_csv's schema'd reader, and the parsed
    fields — not the originals — feed the aggregate. A quoting/splitting
    bug breaks the roundtrip; the oracle computes from the raw columns
    directly."""
    o = _t(spark, sf_dir, "orders")
    line = F.concat_ws(
        ",",
        F.col("o_orderkey"),
        F.col("o_orderpriority"),  # contains '-', no commas: safe unquoted
        F.round(F.col("o_totalprice"), 2),
    )
    parsed = o.select(
        F.from_csv(
            line, F.lit("okey BIGINT, prio STRING, price DOUBLE")
        ).alias("c")
    ).select("c.*")
    return (
        parsed.groupBy("prio")
        .agg(
            F.count("*").alias("n"),
            F.max("okey").alias("max_key"),
            F.round(F.sum("price"), 2).alias("sum_price"),
        )
        .orderBy("prio")
    )


def q171_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar INTERVAL arithmetic (§2.8 date family beyond q33/q34):
    due date = order date + 1 MONTH (calendar month, with month-END
    CLAMPING — Jan 31 + 1 month = Feb 29 in a leap year) + 10 days
    grace. The day-span histogram between order and due dates (28–41
    days, shaped entirely by clamping) is what's graded — both engines
    must clamp identically on every month-length transition in the
    7-year order range."""
    o = _t(spark, sf_dir, "orders")
    due = F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH") + F.expr(
        "INTERVAL 10 DAYS"
    )
    t = o.select(F.datediff(due, F.col("o_orderdate")).alias("span_days"))
    return (
        t.groupBy("span_days")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("span_days")
    )


def q172_from_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML parsing (``from_xml``, Spark 4 §2.1/§2.8 format surface): a
    deterministic XML document is rendered from order fields, parsed
    BACK through from_xml's schema'd reader, and only the parsed fields
    feed the aggregate — an escaping or structure bug breaks the
    roundtrip. The oracle computes from the raw columns (duckdb has no
    XML reader; the roundtrip construction makes the grade independent
    of one)."""
    o = _t(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey"), F.lit("</k><p>"),
        F.col("o_orderpriority"), F.lit("</p><t>"),
        F.round(F.col("o_totalprice"), 2), F.lit("</t></o>"),
    )
    parsed = o.select(
        F.from_xml(xml, F.lit("k BIGINT, p STRING, t DOUBLE")).alias("x")
    ).select("x.*")
    return (
        parsed.groupBy("p")
        .agg(
            F.count("*").alias("n"),
            F.max("k").alias("max_key"),
            F.round(F.sum("t"), 2).alias("sum_total"),
        )
        .orderBy("p")
    )


def q174_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram via ``width_bucket`` (§2.8 numeric family,
    the profiling primitive behind every "distribution of X" dashboard):
    20 buckets over [0, 600000) of order totals, plus the under/overflow
    buckets 0 and n+1 the function reserves. The oracle mirrors Spark's
    EXACT arithmetic — floor((v - lo) / ((hi - lo) / n)) + 1, same IEEE
    operation order — so edge values land identically in both engines."""
    o = _t(spark, sf_dir, "orders")
    b = F.width_bucket(
        F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(20)
    )
    return (
        o.select(b.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def q175_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ordered string aggregation (Spark 4 ``LISTAGG ... WITHIN
    GROUP (ORDER BY ...)``) — the ANSI form of what q132 builds from
    array_sort(collect_list): per nation, its region-mates' names in a
    deterministic comma list. duckdb's STRING_AGG with ORDER BY is the
    oracle; integer keys keep the ordering collation-free."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("__n_q175")
    return spark.sql("""
SELECT n_regionkey,
       COUNT(*) AS n_nations,
       LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_nationkey) AS members
FROM __n_q175
GROUP BY n_regionkey
ORDER BY n_regionkey
""")


def q176_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate family (§2.4 tail): ``count_if``,
    ``bool_and``/``bool_or`` (ANSI EVERY/ANY), and a FILTER-clause
    aggregate — the predicates-as-aggregates shapes dashboards lean on.
    All deterministic and map-side-combined; duckdb mirrors with
    COUNT(*) FILTER and BOOL_AND/BOOL_OR."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 100).alias("n_over_100"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 499).alias("any_over_499"),
            F.expr("sum(value) FILTER (WHERE user_id % 2 = 0)").alias(
                "sum_even_users_raw"
            ),
        )
        .select(
            "event_type", "n_over_100", "all_nonneg", "any_over_499",
            F.round("sum_even_users_raw", 2).alias("sum_even_users"),
        )
        .orderBy("event_type")
    )


def q179_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``mode()`` and ``median()`` aggregates (§2.4 tail; Spark
    3.4+/4): per language — doc count, exact interpolated median of
    n_chars, median doc length in the en-only subset via FILTER, and an
    ``is_mode`` flag marking the corpus-wide modal language (computed by
    the NATIVE mode aggregate, delivered through a 1-row broadcast, not
    a window). Mode is only gradable when strictly unique — ``lang``'s
    'en' share is ~2.7x the runner-up at every SF, and datagen replicas
    preserve proportions, so uniqueness survives every scale axis.
    duckdb mirrors with MODE()/MEDIAN()."""
    d = _t(spark, sf_dir, "documents")
    mode_row = d.agg(F.mode("lang").alias("__mode_lang"))
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.median("n_chars").alias("med_chars"),
            F.expr("median(n_chars) FILTER (WHERE n_chars >= 200)").alias(
                "med_long_chars"
            ),
        )
        .crossJoin(F.broadcast(mode_row))
        .select(
            "lang",
            "n_docs",
            "med_chars",
            "med_long_chars",
            (F.col("lang") == F.col("__mode_lang")).alias("is_mode"),
        )
        .orderBy("lang")
    )


QUERIES = {
    "q179_mode_median": q179_mode_median,
    "q176_conditional_aggregates": q176_conditional_aggregates,
    "q175_listagg": q175_listagg,
    "q174_width_bucket_histogram": q174_width_bucket_histogram,
    "q172_from_xml": q172_from_xml,
    "q171_interval_arithmetic": q171_interval_arithmetic,
    "q169_from_csv": q169_from_csv,
    "q168_null_safe_join": q168_null_safe_join,
    "q167_lateral_topk": q167_lateral_topk,
    "q164_try_arithmetic": q164_try_arithmetic,
    "q162_variant_json": q162_variant_json,
    "q31_string_fns": q31_string_fns,
    "q32_like_case": q32_like_case,
    "q33_date_fns": q33_date_fns,
    "q34_date_trunc_tumbling": q34_date_trunc_tumbling,
    "q35_math_fns": q35_math_fns,
    "q36_json": q36_json,
    "q37_array_fns": q37_array_fns,
    "q65_map_fns": q65_map_fns,
    "q66_hash_fns": q66_hash_fns,
    "q67_conditional_null": q67_conditional_null,
}

ORACLES = {
    "q179_mode_median": """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(MEDIAN(n_chars) AS DOUBLE) AS med_chars,
       CAST(MEDIAN(n_chars) FILTER (WHERE n_chars >= 200) AS DOUBLE)
         AS med_long_chars,
       lang = (SELECT MODE(lang) FROM documents) AS is_mode
FROM documents
GROUP BY lang
ORDER BY lang
""",
    "q176_conditional_aggregates": """
SELECT event_type,
       COUNT(*) FILTER (WHERE value > 100) AS n_over_100,
       BOOL_AND(value >= 0) AS all_nonneg,
       BOOL_OR(value > 499) AS any_over_499,
       ROUND(SUM(value) FILTER (WHERE user_id % 2 = 0), 2) AS sum_even_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "q175_listagg": """
SELECT n_regionkey, COUNT(*) AS n_nations,
       STRING_AGG(n_name, ',' ORDER BY n_nationkey) AS members
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    "q174_width_bucket_histogram": """
WITH t AS (
  -- LEAST/GREATEST mirror width_bucket's under/overflow clamping: values
  -- >= hi land in bucket n+1 (21), values < lo in bucket 0 — without the
  -- clamp a larger SF's o_totalprice >= 600000 would diverge (ADVICE r6).
  SELECT o_totalprice,
         LEAST(GREATEST(
           CAST(FLOOR((o_totalprice - 0.0) / ((600000.0 - 0.0) / 20)) + 1
                AS BIGINT), 0), 21) AS bucket
  FROM orders
)
SELECT bucket, COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM t GROUP BY bucket ORDER BY bucket
""",
    "q172_from_xml": """
SELECT o_orderpriority AS p, COUNT(*) AS n, MAX(o_orderkey) AS max_key,
       ROUND(SUM(ROUND(o_totalprice, 2)), 2) AS sum_total
FROM orders
GROUP BY o_orderpriority
ORDER BY p
""",
    "q171_interval_arithmetic": """
WITH t AS (
  SELECT DATE_DIFF('day', o_orderdate,
                   o_orderdate + INTERVAL 1 MONTH + INTERVAL 10 DAY)
    AS span_days
  FROM orders
)
SELECT CAST(span_days AS INTEGER) AS span_days, COUNT(*) AS n_orders
FROM t GROUP BY 1 ORDER BY span_days
""",
    "q169_from_csv": """
SELECT o_orderpriority AS prio, COUNT(*) AS n, MAX(o_orderkey) AS max_key,
       ROUND(SUM(ROUND(o_totalprice, 2)), 2) AS sum_price
FROM orders
GROUP BY o_orderpriority
ORDER BY prio
""",
    "q168_null_safe_join": """
WITH e AS (
  SELECT event_id, CAST(JSON_EXTRACT(props, '$.k') AS INTEGER) AS k
  FROM events
),
dim AS (
  SELECT k, COUNT(*) AS k_count FROM e GROUP BY k
)
SELECT e.k, COUNT(*) AS n_rows, CAST(MAX(dim.k_count) AS BIGINT) AS k_count
FROM e JOIN dim ON e.k IS NOT DISTINCT FROM dim.k
GROUP BY e.k
ORDER BY e.k ASC NULLS FIRST
""",
    "q167_lateral_topk": """
SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 2) AS acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
ORDER BY n.n_name, acctbal DESC, t.c_name
""",
    "q164_try_arithmetic": r"""
WITH t AS (
  SELECT event_type,
         CASE WHEN user_id % 5 = 0 THEN NULL
              ELSE value / (user_id % 5) END AS ratio,
         CASE WHEN event_id % 997 = 0 AND user_id > 0 THEN NULL
              ELSE 1 END AS ov,
         CAST(REGEXP_EXTRACT(props, '"k": (\d+)', 1) AS BIGINT) AS k_num
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(COUNT(*) - COUNT(ratio) AS BIGINT) AS n_div_null,
       CAST(COUNT(*) - COUNT(ov) AS BIGINT) AS n_overflow,
       ROUND(SUM(ratio), 2) AS sum_ratio,
       CAST(SUM(k_num) AS BIGINT) AS sum_k
FROM t
GROUP BY event_type
ORDER BY event_type
""",
    "q162_variant_json": """
SELECT event_type,
       COUNT(CAST(JSON_EXTRACT(props, '$.k') AS INTEGER)) AS n_with_k,
       MIN(CAST(JSON_EXTRACT(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(JSON_EXTRACT(props, '$.k') AS INTEGER)) AS max_k,
       CAST(SUM(CAST(JSON_EXTRACT(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "q31_string_fns": """
SELECT p_partkey,
       UPPER(p_name) AS up_name,
       LOWER(p_brand) AS lo_brand,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name_sub,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
       CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS n_tokens,
       LPAD(p_brand, 10, '*') AS brand_pad,
       REVERSE(p_name) AS rev_name,
       CAST(LEVENSHTEIN(p_name, 'widget') AS BIGINT) AS lev_widget
FROM part
ORDER BY p_partkey
LIMIT 100
""",
    "q32_like_case": """
SELECT CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 25 THEN 'medium'
            ELSE 'large' END AS size_bucket,
       CAST(p_type LIKE 'PROMO%' AS INT) AS is_promo,
       COUNT(*) AS n
FROM part
GROUP BY 1, 2
ORDER BY size_bucket, is_promo
""",
    "q33_date_fns": """
SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
       CAST(MONTH(o_orderdate) AS INT) AS mo,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       CAST(DATEDIFF('day', CAST(MIN(l_shipdate) AS DATE),
                     CAST(MAX(l_shipdate) AS DATE)) AS BIGINT) AS ship_span_days
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2
ORDER BY yr, mo
""",
    "q34_date_trunc_tumbling": """
SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
       CAST(HOUR(ts) AS INT) AS hr,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY day, hr, event_type
""",
    "q35_math_fns": """
SELECT l_orderkey, l_linenumber,
       ROUND(SQRT(l_extendedprice), 2) AS sqrt_price,
       CAST(CEIL(l_discount * 100) AS BIGINT) AS ceil_disc,
       CAST(FLOOR(l_tax * 100) AS BIGINT) AS floor_tax,
       ROUND(POW(l_quantity, 2), 2) AS qty_sq,
       ROUND(ABS(l_discount - 0.05), 2) AS abs_disc,
       CAST(l_quantity AS INT) % 7 AS mod7,
       ROUND(LN(l_extendedprice), 4) AS ln_price
FROM lineitem
ORDER BY l_orderkey, l_linenumber, sqrt_price, ceil_disc, floor_tax,
         qty_sq, abs_disc, mod7, ln_price
LIMIT 100
""",
    "q36_json": """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(CASE WHEN CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) > 50 THEN 1 END) AS n_big
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "q37_array_fns": """
SELECT vec_id,
       CAST(LEN(embedding) AS BIGINT) AS dim,
       ROUND(SQRT(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 2) AS l2_norm,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_dim,
       ROUND(CAST(LIST_AGGREGATE(embedding, 'max') AS DOUBLE), 4) AS max_dim
FROM embeddings
ORDER BY vec_id
LIMIT 100
""",
    "q65_map_fns": """
WITH m AS (
  SELECT event_id,
         MAP(['type','uid'], [event_type, CAST(user_id AS VARCHAR)]) AS mp
  FROM events
)
SELECT event_id,
       mp['type'][1] AS type_val,
       CAST(CARDINALITY(mp) AS BIGINT) AS n_keys,
       ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(mp)), ',') AS keys_str
FROM m
ORDER BY event_id
LIMIT 100
""",
    "q66_hash_fns": """
SELECT p_partkey,
       MD5(p_name) AS name_md5,
       SHA256(p_name) AS name_sha256,
       MD5(p_brand || '|' || p_name) AS brand_name_md5
FROM part
ORDER BY p_partkey
LIMIT 100
""",
    "q67_conditional_null": """
SELECT l_orderkey, l_linenumber,
       COALESCE(NULLIF(CAST(l_quantity AS INT) % 3, 0), -1) AS mod3_or_neg1,
       CAST(NULLIF(CAST(l_quantity AS INT) % 3, 0) IS NULL AS INT) AS is_null_flag,
       CASE WHEN l_discount > 0.05 THEN 'high'
            WHEN l_discount > 0.02 THEN 'mid'
            ELSE 'low' END AS disc_bucket,
       ROUND(GREATEST(l_tax, l_discount), 2) AS max_rate,
       ROUND(LEAST(l_tax, l_discount), 2) AS min_rate
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 200
""",
}
