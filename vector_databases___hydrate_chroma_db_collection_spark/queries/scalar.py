"""Scalar-function surface: string/date/math/array/map/json/VARIANT/try_*.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _money_sum,
    load_table,
    query,
)


# --------------------------------------------------------------------------
# Scalar function library: string / math / date / JSON / array / map.
# All built-in pyspark.sql.functions — JVM-side, codegen.
# --------------------------------------------------------------------------


@query(
    "scalar_string_part",
    """
    SELECT p_partkey AS partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           p_type || '/' || p_brand AS type_brand,
           replace(p_name, ' ', '_') AS name_snake,
           substring(p_name, 1, 3) AS name_pfx,
           CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS is_bolt
    FROM part
    """,
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.substring("p_name", 1, 3).alias("name_pfx"),
        F.when(F.col("p_name").like("%bolt%"), 1).otherwise(0).alias("is_bolt"),
    )


@query(
    "scalar_math_lineitem",
    """
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           round(abs(l_extendedprice - 1000.0), 2) AS abs_diff,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(power(1 + l_tax, 2), 6) AS tax_sq,
           l_partkey % 10 AS part_mod
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_bucket"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_partkey") % 10).alias("part_mod"),
    )


@query(
    "scalar_date_orders",
    """
    SELECT year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           quarter(o_orderdate) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           count(*) AS order_cnt,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS month_revenue
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.quarter("o_orderdate").alias("qtr"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            _money_sum(F.col("o_totalprice")).alias("month_revenue"),
        )
    )


@query(
    "scalar_json_events",
    """
    SELECT event_type,
           count(*) AS cnt,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "scalar_array_embeddings",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS vec_norm,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def scalar_array_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import l2_norm

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
        F.round(l2_norm("embedding"), 4).alias("vec_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_elem"),
    )


@query(
    "scalar_map_metadata",
    """
    SELECT CAST(doc_id AS VARCHAR) AS id,
           lang AS meta_lang,
           source AS meta_source
    FROM documents
    WHERE doc_id < 50
    """,
)
def scalar_map_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element access (the reference's metadata
    wrapping, sas:181, generalized beyond the hard-coded key)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    with_map = d.select(
        F.col("doc_id").cast("string").alias("id"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("metadata"),
    )
    return with_map.select(
        "id",
        F.element_at("metadata", "lang").alias("meta_lang"),
        F.element_at("metadata", "source").alias("meta_source"),
    )


@query(
    "scalar_case_null_handling",
    """
    SELECT c_custkey AS custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS wealth_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
           CAST(c_acctbal > 0 AS INT) AS is_positive,
           ifnull(NULL, c_custkey) AS id_fallback
    FROM customer
    """,
)
def scalar_case_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("wealth_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        (F.col("c_acctbal") > 0).cast("int").alias("is_positive"),
        F.ifnull(F.lit(None).cast("bigint"), F.col("c_custkey")).alias("id_fallback"),
    )


@query(
    "scalar_array_functions",
    """
    SELECT vec_id,
           list_contains(list_transform(embedding, x -> x > 0), true) AS any_positive,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem,
           round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_elem,
           round(CAST(list_sum(list_slice(embedding, 1, 8)) AS DOUBLE), 4) AS head_sum
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id",
        F.exists("embedding", lambda x: x > 0).alias("any_positive"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_elem"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("min_elem"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8),
                F.lit(0.0).cast("float"),
                lambda acc, x: acc + x,
            ).cast("double"),
            4,
        ).alias("head_sum"),
    )


@query(
    "scalar_date_arithmetic",
    """
    SELECT o_orderkey AS orderkey,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           round(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') / 365.25, 4) AS years_to_y2k
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(
            F.col("o_orderdate"), F.to_timestamp(F.lit("1995-01-01"))
        ).cast("bigint").alias("days_since_epoch_start"),
        F.round(
            F.datediff(F.to_timestamp(F.lit("2000-01-01")), F.col("o_orderdate"))
            / 365.25,
            4,
        ).alias("years_to_y2k"),
    )


# --------------------------------------------------------------------------
# Extended scalar families: string padding/casing/translate, regexp
# counting, array set-algebra and construction.
# --------------------------------------------------------------------------


@query(
    "scalar_string_extended",
    """
    SELECT p_partkey AS partkey,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           reverse(p_name) AS name_rev,
           repeat(p_brand, 2) AS brand_twice,
           translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
           ascii(substring(p_name, 1, 1)) AS first_char_code,
           len(regexp_extract_all(p_name, '[aeiou]')) AS vowel_count,
           CAST(regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS INT) AS two_words
    FROM part
    WHERE p_partkey < 500
    """,
)
def scalar_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_name").alias("name_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_lower_vowels"),
        F.ascii(F.substring("p_name", 1, 1)).alias("first_char_code"),
        F.regexp_count("p_name", F.lit("[aeiou]")).alias("vowel_count"),
        F.regexp_like("p_name", F.lit("^[a-z]+ [a-z]+$")).cast("int").alias("two_words"),
    )


@query(
    "scalar_array_algebra",
    """
    SELECT vec_id,
           len(list_distinct(list_concat(head4, tail4))) AS union_distinct,
           len(list_filter(head4, x -> list_contains(tail4, x))) AS overlap,
           array_to_string(list_sort(list_transform(head4,
               x -> round(CAST(x AS DOUBLE), 3))), ',') AS head_sorted,
           array_to_string(list_transform(range(1, 4),
               i -> CAST(i * vec_id AS BIGINT)), ',') AS id_multiples
    FROM (
        SELECT vec_id,
               list_slice(embedding, 1, 4) AS head4,
               list_slice(embedding, 61, 64) AS tail4
        FROM embeddings
        WHERE vec_id < 40
    )
    """,
)
def scalar_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    base = e.select(
        "vec_id",
        F.slice("embedding", 1, 4).alias("head4"),
        F.slice("embedding", 61, 4).alias("tail4"),
    )
    return base.select(
        "vec_id",
        F.size(F.array_distinct(F.concat("head4", "tail4"))).alias("union_distinct"),
        F.size(
            F.filter("head4", lambda x: F.array_contains(F.col("tail4"), x))
        ).alias("overlap"),
        F.array_join(
            F.array_sort(
                F.transform("head4", lambda x: F.round(x.cast("double"), 3))
            ).cast("array<string>"),
            ",",
        ).alias("head_sorted"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda i: (i * F.col("vec_id")).cast("bigint"),
            ).cast("array<string>"),
            ",",
        ).alias("id_multiples"),
    )


@query(
    "scalar_struct_map_ops",
    """
    SELECT doc_id,
           struct_pack(lang := lang, src := source).lang AS s_lang,
           array_to_string(map_keys(MAP {'lang': lang, 'source': source}), ',') AS mkeys,
           array_to_string(map_values(MAP {'lang': lang, 'source': source}), ',') AS mvals,
           cardinality(MAP {'lang': lang, 'source': source}) AS msize
    FROM documents
    WHERE doc_id < 50
    """,
)
def scalar_struct_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access, map keys/values/size."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.struct(F.col("lang").alias("lang"), F.col("source").alias("src"))["lang"].alias("s_lang"),
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
        F.size(m).alias("msize"),
    )


@query(
    "scalar_from_json_events",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE event_id < 500
    """,
)
def scalar_from_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON parsing (from_json -> struct field access)
    as opposed to the path-string get_json_object form."""
    from pyspark.sql.types import LongType, StructField, StructType

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    schema = StructType([StructField("k", LongType())])
    parsed = e.select("event_id", F.from_json("props", schema).alias("p"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_mod"),
    )


@query(
    "scalar_bitwise_events",
    """
    SELECT event_id,
           event_id & 255                       AS low_byte,
           xor(event_id, user_id)               AS xor_user,
           (event_id % 1024) << 2               AS shifted,
           CAST(bit_count(event_id) AS BIGINT)  AS bits
    FROM events
    WHERE event_id < 2000
    """,
)
def scalar_bitwise_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface: AND/XOR masks, shifts, popcount —
    the building blocks of hash partitioners, bloom filters and
    bit-packed feature flags. Pure codegen, no shuffle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xor_user"),
        F.shiftleft(F.col("event_id") % 1024, 2).cast("bigint").alias("shifted"),
        F.bit_count("event_id").cast("bigint").alias("bits"),
    )


@query(
    "scalar_trig_part",
    """
    SELECT p_partkey,
           round(sin(p_retailprice), 6)            AS sin_price,
           round(cos(p_retailprice), 6)            AS cos_price,
           round(atan2(p_retailprice, 1000.0), 6)  AS atan2_price,
           round(degrees(atan(p_retailprice / 1000.0)), 6) AS angle_deg
    FROM part
    """,
)
def scalar_trig_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric scalar surface (sin/cos/atan2/atan/degrees) —
    the geo-distance and phase-feature building blocks; both engines
    evaluate libm doubles, rounded well above ulp noise."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.sin("p_retailprice"), 6).alias("sin_price"),
        F.round(F.cos("p_retailprice"), 6).alias("cos_price"),
        F.round(F.atan2(F.col("p_retailprice"), F.lit(1000.0)), 6).alias(
            "atan2_price"
        ),
        F.round(F.degrees(F.atan(F.col("p_retailprice") / 1000.0)), 6).alias(
            "angle_deg"
        ),
    )


# --------------------------------------------------------------------------
# Round-4 second batch: Spark-4 VARIANT JSON, mergeable HLL sketches with
# the exact-twin contract, time-interval RANGE frames, array set algebra,
# translate/reverse scalars, a salted skew join proven against the plain
# join, and the stream-static join's batch twin.
# --------------------------------------------------------------------------


@query(
    "scalar_variant_json_events",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE event_id < 3000
    """,
)
def scalar_variant_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion: ``parse_json`` to a variant value,
    typed reads via ``try_variant_get`` — the schema-on-read path for
    semi-structured columns (the open-format successor to
    get_json_object string plucking; binary-encoded, so repeated
    reads skip re-parsing). Oracle reads the same JSON with DuckDB's
    json_extract."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_mod"),
    )


@query(
    "scalar_array_setops_part",
    """
    SELECT p_partkey,
           coalesce(array_to_string(list_sort(list_intersect(
               [p_type, p_name, p_brand],
               ['ECONOMY', 'SMALL', 'JUMBO'])), '|'), '') AS overlap,
           coalesce(array_to_string(list_sort(list_filter(
               [p_type, p_name, p_brand],
               x -> NOT list_contains(['ECONOMY', 'SMALL', 'JUMBO'], x))), '|'), '') AS rest,
           len(list_distinct([p_type, p_name, p_brand])) AS n_distinct_attrs
    FROM part
    """,
)
def scalar_array_setops_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / except / distinct size) as
    codegen expressions; results sorted + joined to strings so the
    comparison is order-insensitive on both engines."""
    p = load_table(spark, sf_dir, "part")
    attrs = F.array("p_type", "p_name", "p_brand")
    probe = F.array(F.lit("ECONOMY"), F.lit("SMALL"), F.lit("JUMBO"))
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_intersect(attrs, probe)), "|").alias(
            "overlap"
        ),
        F.array_join(F.array_sort(F.array_except(attrs, probe)), "|").alias("rest"),
        F.size(F.array_distinct(attrs)).cast("bigint").alias("n_distinct_attrs"),
    )


@query(
    "scalar_translate_reverse",
    """
    SELECT c_custkey,
           translate(c_name, '#_', '-.') AS squashed,
           reverse(lower(c_mktsegment))  AS rev_segment,
           length(replace(c_name, 'Customer', '')) AS stripped_len
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def scalar_translate_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level string surface: translate (per-char map),
    reverse, replace — the normalization primitives under id
    canonicalization and fuzzy matching."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.translate("c_name", "#_", "-.").alias("squashed"),
        F.reverse(F.lower("c_mktsegment")).alias("rev_segment"),
        F.length(F.replace("c_name", F.lit("Customer"), F.lit(""))).cast(
            "bigint"
        ).alias("stripped_len"),
    )


# --------------------------------------------------------------------------
# Round-4 fourth batch: ANSI-safe try_* arithmetic, map higher-order
# functions, and date-sequence generation.
# --------------------------------------------------------------------------


@query(
    "scalar_try_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / nullif(l_quantity - l_quantity, 0) AS div_by_zero,
           try_cast(l_returnflag AS BIGINT)                     AS bad_cast,
           CAST(round(l_extendedprice / nullif(l_quantity, 0) * 100) AS BIGINT) AS unit_cents
    FROM lineitem
    WHERE l_orderkey < 400
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: try_divide / try_cast return NULL
    instead of failing the job — the error-isolation surface a
    pipeline needs when one malformed row must not kill a 100 TB
    scan. Division by zero and an unparseable cast both surface as
    NULLs the oracle reproduces with nullif/try_cast."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),
        F.col("l_returnflag").try_cast("bigint").alias("bad_cast"),
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")) * 100
        ).cast("bigint").alias("unit_cents"),
    )


@query(
    "scalar_map_hof_orders",
    """
    SELECT o_orderkey,
           concat('base=', CAST(round(o_totalprice, 2) AS VARCHAR),
                  ';taxed=', CAST(round(o_totalprice * 1.1, 2) AS VARCHAR)) AS fee_map,
           2 AS n_keys
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def scalar_map_hof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a map from arrays,
    transform_values (per-entry lambda), then serialize via
    map_entries -> transform -> array_join. DuckDB has no comparable
    map surface, so the oracle reproduces the serialized STRING — the
    values and ordering are what the driver hashes, the map HOF
    machinery is what the Spark side exercises."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    m = F.map_from_arrays(
        F.array(F.lit("base"), F.lit("taxed")),
        F.array(F.col("o_totalprice"), F.col("o_totalprice")),
    )
    taxed = F.transform_values(
        m, lambda k, v: F.when(k == "taxed", F.round(v * 1.1, 2)).otherwise(F.round(v, 2))
    )
    entries = F.transform(
        F.map_entries(taxed),
        lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
    )
    return o.select(
        "o_orderkey",
        F.array_join(entries, ";").alias("fee_map"),
        F.size(F.map_keys(taxed)).cast("bigint").alias("n_keys"),
    )


@query(
    "scalar_sequence_dates",
    """
    SELECT o_orderkey,
           CAST(unnest(generate_series(CAST(o_orderdate AS DATE),
                                       CAST(o_orderdate AS DATE) + 3,
                                       INTERVAL 1 DAY)) AS TIMESTAMP) AS day
    FROM orders
    WHERE o_orderkey < 300
    """,
)
def scalar_sequence_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-sequence generation + explode: each order expanded to its
    4-day observation window — the row-generation primitive behind
    calendar spines and gap-filling joins. sequence() is codegen;
    explode multiplies rows without a shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.explode(
            F.sequence(
                F.col("o_orderdate").cast("date"),
                F.date_add(F.col("o_orderdate").cast("date"), 3),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    ).withColumn("day", F.col("day").cast("timestamp"))


@query(
    "scalar_url_parse",
    """
    SELECT doc_id,
           source || '.example.com'                    AS host,
           '/docs/' || CAST(doc_id AS VARCHAR)         AS path,
           'lang=' || lang                             AS query,
           lang                                        AS lang_param
    FROM documents
    WHERE doc_id < 300
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with parse_url — the first step of every
    web-crawl pipeline (host-level dedup, domain quality lists, path
    routing). The URLs are constructed from fixture columns so the
    DuckDB oracle can state the expected parts exactly; the Spark side
    must recover them THROUGH the real parser (HOST/PATH/QUERY + a
    keyed query parameter), all codegen expressions."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
