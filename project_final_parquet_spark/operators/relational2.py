"""Relational operator suite, part 2: window frames, ranking families,
regex/fuzzy string ops, map functions, schema-evolving unions, hex
codecs (reference O14), the UDF surface, and file-format round-trips
(CSV/JSON/ORC sinks+sources — the reference supports only its own
format, SURVEY.md §2.2 row 1).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import DSUM_SQL, dsum, query
from ..tables import load

@query(
    "q31_window_range_frame",
    oracle=f"""
    SELECT o1.o_custkey, o1.o_orderkey,
           {DSUM_SQL.format(expr="o2.o_totalprice")} AS spend_30d
    FROM (
      SELECT o_custkey, o_orderkey,
             date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS t
      FROM orders
    ) o1
    JOIN (
      SELECT o_custkey AS ck, o_totalprice,
             date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS t2
      FROM orders
    ) o2 ON o1.o_custkey = o2.ck AND o2.t2 BETWEEN o1.t - 30 AND o1.t
    GROUP BY o1.o_custkey, o1.o_orderkey
    ORDER BY o1.o_custkey, o1.o_orderkey
    """,
)
def q31_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: rolling 30-day spend per customer, ordered on an
    epoch-day integer (datediff on NTZ — TZ-free). The oracle restates
    the frame as a self-join; Spark's RANGE frame includes all peers at
    equal order value, which is exactly the BETWEEN semantics.
    """
    o = load(spark, sf_dir, "orders").withColumn(
        "t", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
    )
    w = W.partitionBy("o_custkey").orderBy("t").rangeBetween(-30, 0)
    # .over must wrap the aggregate itself; the decimal→double cast sits
    # outside the window expression
    spend = F.sum(F.col("o_totalprice").cast("decimal(38,10)")).over(w)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            spend.cast("double").alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q32_rank_functions",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           DENSE_RANK()   OVER w AS drank,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST()    OVER w AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q32_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / ntile / percent_rank / cume_dist over a total order."""
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "q33_regex_fuzzy",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           CAST(regexp_matches(p_type, '^(ECONOMY|PROMO)') AS BOOLEAN) AS is_cheap,
           CAST(levenshtein(p_brand, 'Brand#10') AS INT) AS brand_dist
    FROM part
    """,
)
def q33_regex_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / global regexp_replace / rlike / levenshtein."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike(r"^(ECONOMY|PROMO)").alias("is_cheap"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("brand_dist"),
    )


@query(
    "q34_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           1 AS n_keys,
           'k' AS first_key
    FROM events
    WHERE event_type = 'click'
    """,
)
def q34_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → MapType → map_keys/size/element access (props = {"k": n})."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    as_map = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(as_map, "k").alias("k_val"),
        F.size(as_map).alias("n_keys"),
        F.element_at(F.map_keys(as_map), 1).alias("first_key"),
    )


@query(
    "q35_union_by_name",
    oracle="""
    SELECT src, c_custkey, c_acctbal, c_mktsegment FROM (
      SELECT 'full' AS src, c_custkey, c_acctbal, c_mktsegment FROM customer
      UNION ALL
      SELECT 'slim' AS src, c_custkey, NULL AS c_acctbal, c_mktsegment
      FROM customer WHERE c_nationkey < 5
    )
    """,
)
def q35_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: unionByName(allowMissingColumns=True) pads
    the missing column with NULL — the engine-level analog of the
    reference's union-of-row-schemas write model (SURVEY.md §1.4)."""
    c = load(spark, sf_dir, "customer")
    full = c.select(
        F.lit("full").alias("src"), "c_custkey", "c_acctbal", "c_mktsegment"
    )
    slim = (
        c.filter(F.col("c_nationkey") < 5)
        .select(F.lit("slim").alias("src"), "c_custkey", "c_mktsegment")
    )
    return full.unionByName(slim, allowMissingColumns=True)


@query(
    "q36_hex_codecs",
    oracle="""
    SELECT p_partkey,
           lower(hex(p_name)) AS name_hex,
           CAST(unhex(lower(hex(p_name))) AS VARCHAR) AS roundtrip,
           (CAST(unhex(lower(hex(p_name))) AS VARCHAR) = p_name) AS ok
    FROM part
    """,
)
def q36_hex_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex codecs (reference O14, src/crypto_utils.cpp:143-161 — its
    BytesToHex emits lowercase, Spark's HEX uppercase, hence lower())."""
    p = load(spark, sf_dir, "part")
    hexed = F.lower(F.hex(F.col("p_name").cast("binary")))
    return p.select(
        "p_partkey",
        hexed.alias("name_hex"),
        F.unhex(hexed).cast("string").alias("roundtrip"),
        (F.unhex(hexed).cast("string") == F.col("p_name")).alias("ok"),
    )


@query(
    "q37_try_decrypt_wrong_key",
    oracle="""
    SELECT COUNT(*) AS n_rows, CAST(0 AS BIGINT) AS n_decryptable
    FROM documents
    """,
)
def q37_try_decrypt_wrong_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative path: try_aes_decrypt under the wrong key yields NULL for
    every row instead of failing the job (reference analog: GCM tag
    mismatch throws, src/crypto_utils.cpp:135-137; the engine offers
    both fail-fast aes_decrypt and NULL-on-failure try_aes_decrypt)."""
    docs = load(spark, sf_dir, "documents")
    enc = docs.select(
        F.aes_encrypt(
            F.col("text"),
            F.unhex(F.lit("00112233445566778899AABBCCDDEEFF")),
            F.lit("GCM"),
        ).alias("ct")
    )
    dec = enc.select(
        F.try_aes_decrypt(
            F.col("ct"),
            F.unhex(F.lit("FFEEDDCCBBAA99887766554433221100")),
            F.lit("GCM"),
        ).alias("pt")
    )
    return dec.agg(
        F.count(F.lit(1)).alias("n_rows"), F.count("pt").alias("n_decryptable")
    )


@query(
    "q38_pandas_udf",
    oracle="""
    SELECT doc_id,
           length(text) * 1.5 + len(string_split(text, ' ')) AS score
    FROM documents
    """,
)
def q38_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF — the sanctioned Python scalar path.
    Deterministic arithmetic so the oracle can restate it in SQL."""
    from pyspark.sql.types import DoubleType

    def make_udf():
        # nested => cloudpickle by value (see operators/multimodal.py);
        # explicit returnType form because `from __future__ import
        # annotations` stringifies hints, which pandas_udf can't resolve
        def score_fn(n_chars, n_tokens):
            return n_chars * 1.5 + n_tokens

        return F.pandas_udf(score_fn, DoubleType())

    score = make_udf()
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        score(
            F.length("text").cast("double"),
            F.size(F.split(F.col("text"), " ")).cast("double"),
        ).alias("score"),
    )


# --- file-format round-trips (CSV / JSON / ORC) ----------------------------

_IO_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_io")


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Write orders to ``fmt``, read it back with an explicit schema, and
    aggregate — proving sink+source fidelity for the format."""
    path = os.path.join(_IO_ROOT, os.path.basename(sf_dir.rstrip("/")), fmt)
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
        back = (
            spark.read.option("header", True)
            .schema("o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double")
            .csv(path)
        )
    elif fmt == "json":
        writer.json(path)
        back = spark.read.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double"
        ).json(path)
    else:
        writer.orc(path)
        back = spark.read.orc(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


_RT_ORACLE = f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """


@query("q39_csv_roundtrip", oracle=_RT_ORACLE)
def q39_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round-trip (explicit schema, header)."""
    return _roundtrip(spark, sf_dir, "csv")


@query("q40_json_roundtrip", oracle=_RT_ORACLE)
def q40_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source round-trip (explicit schema)."""
    return _roundtrip(spark, sf_dir, "json")


@query("q41_orc_roundtrip", oracle=_RT_ORACLE)
def q41_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round-trip (schema from ORC metadata)."""
    return _roundtrip(spark, sf_dir, "orc")


@query(
    "q43_left_outer_join",
    oracle="""
    SELECT c.c_custkey, p.n_pending
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_pending
      FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey
    ) p ON c.c_custkey = p.o_custkey
    ORDER BY c.c_custkey
    """,
)
def q43_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched left rows as NULLs."""
    cust = load(spark, sf_dir, "customer")
    pending = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_pending"))
    )
    return (
        cust.join(pending, cust.c_custkey == pending.o_custkey, "left")
        .select("c_custkey", "n_pending")
        .orderBy("c_custkey")
    )


@query(
    "q44_null_semantics",
    oracle="""
    WITH g AS (
      SELECT c_custkey,
             NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
             CASE WHEN c_acctbal < 1000 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           COALESCE(a.seg_or_null, 'masked') AS seg_filled,
           (a.bal IS NULL) AS bal_missing
    FROM g a JOIN g b
      ON a.seg_or_null IS NOT DISTINCT FROM b.seg_or_null
     AND a.c_custkey + 1 = b.c_custkey
    ORDER BY cust_a
    """,
)
def q44_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: NULLIF/COALESCE/IS NULL plus a NULL-SAFE equality
    join (<=> / IS NOT DISTINCT FROM) — ordinary equality would silently
    drop every NULL=NULL pair."""
    c = load(spark, sf_dir, "customer")
    g = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.when(F.col("c_acctbal") < 1000, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    a = g.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("seg_or_null").alias("seg_a"),
        F.col("bal").alias("bal_a"),
    )
    b = g.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("seg_or_null").alias("seg_b"),
    )
    return (
        a.join(
            b,
            a.seg_a.eqNullSafe(b.seg_b)
            & (F.col("cust_a") + 1 == F.col("cust_b")),
        )
        .select(
            "cust_a",
            "cust_b",
            F.coalesce("seg_a", F.lit("masked")).alias("seg_filled"),
            F.col("bal_a").isNull().alias("bal_missing"),
        )
        .orderBy("cust_a")
    )


@query(
    "q42_approx_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS hll_ok,
           TRUE AS median_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q42_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates (HLL++ distinct, GK quantiles) — the
    100 TB substitutes for their exact cousins — gated by ERROR BOUND,
    not by value: the sketch outputs are engine-specific by design, so
    the query emits booleans asserting |approx − exact| within the
    sketches' documented bounds (HLL++ rsd 0.05 → 3σ = 15% relative;
    GK accuracy 1000 → rank error 1e-3, checked against the generous
    exact 45th–55th percentile envelope) and the oracle emits literal
    TRUE — a hash match IS the epsilon check.

    Plan note: the exact distinct count runs as its own two-stage
    aggregate (distinct → count) joined back by broadcast, NOT as a
    ``countDistinct`` inside the sketch aggregate — countDistinct
    compiles to an Expand that duplicates every input row per aggregate
    group, and the exact-percentile buffers in the same Aggregate would
    be built over the expanded input (measured at sf0.1: 12.8 s fused
    vs 3.7 s split, 3.5×). At 100 TB the split form is also the right
    shape: the distinct pre-aggregate combines map-side."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    exact = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    # ONE exact-percentile buffer for both envelope bounds
    # (optimization r13): two scalar percentile() aggregates each
    # collected the full per-group value buffer; the array form
    # computes both order statistics from a single buffer — same
    # algorithm, identical values, half the aggregation state.
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias(
            "approx_median"
        ),
        F.percentile(
            price, F.array(F.lit(0.45), F.lit(0.55))
        ).alias("lohi"),
    ).join(F.broadcast(exact), "l_returnflag")
    agg = agg.withColumn("lo", F.col("lohi")[0]).withColumn(
        "hi", F.col("lohi")[1]
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.15
        ).alias("hll_ok"),
        F.col("approx_median")
        .cast("double")
        .between(F.col("lo"), F.col("hi"))
        .alias("median_ok"),
    ).orderBy("l_returnflag")
