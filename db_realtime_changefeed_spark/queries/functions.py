"""§2.H scalar function families — one composite query per family
(string / date / math / conditional / array / JSON / map).

All built-in pyspark.sql.functions → JVM whole-stage codegen; no
Python in the hot path. Cross-engine determinism notes:

- DuckDB `round(double, n)` rounds decimal-string-style (2.675→2.68)
  while Spark rounds the exact binary value (→2.67), so graded
  queries never round data-derived doubles. Transcendentals
  (exp/ln/log10) may differ by 1 ulp between JVM and libm — we cast
  those results to float, which absorbs the ulp (collision odds
  ~2^-28/row).
- DuckDB returns BIGINT where Spark returns INT (length, year,
  instr, ...): oracle SQL casts to match Spark's narrower type.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           substring(p_name, 1, 5) AS sub5,
           upper(p_name) AS up,
           lower(p_brand) AS lo,
           concat_ws('-', p_brand, p_type) AS cat,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS pad,
           replace(p_name, 'a', '@') AS rep,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS devowel,
           CAST(length(p_name) AS INTEGER) AS nlen,
           CAST(instr(p_name, 'e') AS INTEGER) AS pos_e,
           trim(concat(' ', p_type, ' ')) AS trimmed
    FROM part
    """,
)
def fn_string(spark, sf_dir):
    """String family (§2.H1). Spark regexp_replace is global by
    default; DuckDB needs the 'g' flag."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 5).alias("sub5"),
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.concat_ws("-", "p_brand", "p_type").alias("cat"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("pad"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("rep"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("devowel"),
        F.length("p_name").alias("nlen"),
        F.instr(F.col("p_name"), "e").alias("pos_e"),
        F.trim(F.concat(F.lit(" "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yy,
           CAST(month(o_orderdate) AS INTEGER) AS mm,
           CAST(day(o_orderdate) AS INTEGER) AS dd,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           CAST(datediff('day', DATE '1995-01-01',
                         CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
           epoch_ms(o_orderdate) AS ems,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate
    FROM orders
    """,
)
def fn_date(spark, sf_dir):
    """Date/time family (§2.H2). Spark dayofweek is 1=Sunday,
    DuckDB 0=Sunday → minus 1 on the Spark side. DATE-typed outputs
    are rendered as ISO strings on BOTH sides: Spark dates reach
    pandas as objects and DuckDB dates as datetime64, so a
    dataframe-level comparison would see different schemas for
    logically equal values."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    iso = "yyyy-MM-dd"
    return o.select(
        "o_orderkey",
        F.year(d).alias("yy"),
        F.month(d).alias("mm"),
        F.dayofmonth(d).alias("dd"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), iso).alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .alias("days_since"),
        F.date_format(F.last_day(d), iso).alias("month_end"),
        (F.dayofweek(d) - F.lit(1)).alias("dow"),
        F.unix_millis(d).alias("ems"),
        F.date_format(d.cast("date"), iso).alias("odate"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil,
           abs(l_quantity - 25.0) AS qty_dev,
           l_discount * l_discount AS disc_sq,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(exp(l_discount) AS FLOAT) AS disc_exp,
           CAST(ln(l_extendedprice) AS FLOAT) AS price_ln,
           CAST(log10(l_extendedprice) AS FLOAT) AS price_log10,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_sign,
           greatest(l_quantity, l_discount * 100) AS gr,
           least(l_tax, l_discount) AS le,
           CAST(l_linenumber % 3 AS INTEGER) AS ln_mod
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    """Math family (§2.H3): exact IEEE ops stay double; libm-backed
    transcendentals are float-stabilized (module docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    q, ep, disc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(ep / 1000).alias("price_k"),
        F.ceil(q / 7).alias("qty_ceil"),
        F.abs(q - 25.0).alias("qty_dev"),
        (disc * disc).alias("disc_sq"),
        F.sqrt(ep).alias("price_sqrt"),
        F.exp(disc).cast("float").alias("disc_exp"),
        F.log(ep).cast("float").alias("price_ln"),
        F.log10(ep).cast("float").alias("price_log10"),
        F.signum(q - 25.0).alias("qty_sign"),
        F.greatest(q, disc * 100).alias("gr"),
        F.least(F.col("l_tax"), disc).alias("le"),
        F.pmod(F.col("l_linenumber"), F.lit(3)).alias("ln_mod"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'fulfilled'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END AS status_desc,
           if(o_totalprice > 250000, 'big', 'small') AS size_tag,
           coalesce(nullif(o_orderstatus, 'P'), 'was_p') AS depended,
           ifnull(nullif(o_orderpriority, '5-LOW'), 'LOWEST') AS prio,
           CASE WHEN o_totalprice > 400000 AND o_orderstatus = 'O'
                THEN o_totalprice * 0.9 ELSE o_totalprice END AS adj_price
    FROM orders
    """,
)
def fn_cond(spark, sf_dir):
    """Conditional family (§2.H4): CASE, if, coalesce/nullif/nvl."""
    o = load_table(spark, sf_dir, "orders")
    st, tp = F.col("o_orderstatus"), F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(st == "F", "fulfilled")
        .when(st == "O", "open")
        .otherwise("pending")
        .alias("status_desc"),
        F.when(tp > 250000, "big").otherwise("small").alias("size_tag"),
        F.coalesce(F.nullif(st, F.lit("P")), F.lit("was_p")).alias("depended"),
        F.nvl(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("LOWEST"))
        .alias("prio"),
        F.when((tp > 400000) & (st == "O"), tp * 0.9).otherwise(tp)
        .alias("adj_price"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS f1,
           CAST(embedding[2] AS DOUBLE) AS f2,
           CAST(embedding[3] AS DOUBLE) AS f3,
           CAST(embedding[4] AS DOUBLE) AS f4,
           CAST(list_aggregate(
                  list_transform(embedding,
                                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  'sum') AS FLOAT) AS norm2,
           list_aggregate(embedding, 'max') AS vmax,
           list_sort(embedding)[1] AS low1,
           list_sort(embedding)[2] AS low2,
           list_sort(embedding)[3] AS low3,
           embedding[1] AS first_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           list_aggregate(
             list_transform(list_filter(embedding, x -> x > 0),
                            x -> CAST(x AS DOUBLE)),
             'sum') AS pos_sum
    FROM embeddings
    """,
)
def fn_array(spark, sf_dir):
    """Array / higher-order family (§2.H5) over the 64-dim embedding
    column: size, slice, transform, filter, aggregate, sort. Every
    output that crosses the comparison boundary is SCALAR — the
    driver's pandas canonicalizer sort_values() cannot hash list
    cells (round-1 FAIL: `unhashable type: 'list'`), so array results
    are projected element-wise / reduced in-order. The folds run
    left-to-right on both engines, so float sums are bitwise-equal."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    first4 = F.transform(F.slice(emb, 1, 4), dbl)
    low3 = F.slice(F.sort_array(emb), 1, 3)
    positives = F.filter(emb, lambda x: x > 0)
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(first4, 1).alias("f1"),
        F.element_at(first4, 2).alias("f2"),
        F.element_at(first4, 3).alias("f3"),
        F.element_at(first4, 4).alias("f4"),
        F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x))
        .cast("float")
        .alias("norm2"),
        F.array_max(emb).alias("vmax"),
        F.element_at(low3, 1).alias("low1"),
        F.element_at(low3, 2).alias("low2"),
        F.element_at(low3, 3).alias("low3"),
        F.element_at(emb, 1).alias("first_val"),
        F.size(positives).alias("n_pos"),
        F.aggregate(F.transform(positives, dbl), F.lit(0.0),
                    lambda acc, x: acc + x).alias("pos_sum"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           json_extract_string(props, '$.k') IS NOT NULL AS has_k,
           CAST(json_extract_string(props, '$.missing') AS INTEGER) AS k_missing
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    """JSON family (§2.H6) on the props JSON-string column:
    get_json_object + from_json (schema'd parse)."""
    ev = load_table(spark, sf_dir, "events")
    props = F.col("props")
    parsed = F.from_json(props, "map<string,int>")
    return ev.select(
        "event_id",
        F.get_json_object(props, "$.k").alias("k_str"),
        F.element_at(parsed, "k").alias("k_int"),
        F.get_json_object(props, "$.k").isNotNull().alias("has_k"),
        F.element_at(parsed, "missing").alias("k_missing"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           'k,val' AS mkeys,
           CAST(2 AS INTEGER) AS msize,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) AS m_k,
           value AS m_val
    FROM events
    """,
)
def fn_map(spark, sf_dir):
    """Map family (§2.H7): build a map from the event payload, then
    map_keys/size/element_at. The oracle validates the extracted
    VALUES; neither the map nor any array crosses the comparison
    boundary (round-1 FAIL: the driver's pandas canonicalizer cannot
    sort list cells, so mkeys is serialized with array_join)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    m = F.create_map(F.lit("k"), k, F.lit("val"), F.col("value"))
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("mkeys"),
        F.size(m).alias("msize"),
        F.element_at(m, "k").alias("m_k"),
        F.element_at(m, "val").alias("m_val"),
    )


@query(
    "fn_hash_encode",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS h_md5,
           sha256(p_name) AS h_sha256,
           lower(hex(p_name)) AS hx,
           base64(encode(p_name)) AS b64,
           decode(from_base64(base64(encode(p_name)))) = p_name AS roundtrip
    FROM part
    """,
)
def fn_hash_encode(spark, sf_dir):
    """Hash + binary-encoding family (§2.H extra): md5 / sha256 /
    hex / base64 with a decode round-trip proof. Hex is lowercased
    on both sides (Spark emits uppercase nibbles, DuckDB lowercase).
    All JVM built-ins — the content-addressing primitives the dedup
    operators build on."""
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    b64 = F.base64(F.encode(name, "UTF-8"))
    return p.select(
        "p_partkey",
        F.md5(name).alias("h_md5"),
        F.sha2(name, 256).alias("h_sha256"),
        F.lower(F.hex(name)).alias("hx"),
        b64.alias("b64"),
        (F.decode(F.unbase64(b64), "UTF-8") == name).alias("roundtrip"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS lo_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, 21845) AS xored,
           event_id << 3 AS shl,
           event_id >> 4 AS shr,
           CAST(bit_count(event_id) AS INTEGER) AS popcount,
           ~event_id AS inverted
    FROM events
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise family (§2.H extra): and/or/xor/shifts/popcount/not on
    int64 keys — exact integer ops, identical on any engine. The
    flag-masking and hash-mixing primitives under the partitioning
    and dedup operators."""
    ev = load_table(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("lo_byte"),
        e.bitwiseOR(F.lit(4096)).alias("with_flag"),
        e.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(e, 3).alias("shl"),
        F.shiftright(e, 4).alias("shr"),
        F.bit_count(e).alias("popcount"),
        F.bitwise_not(e).alias("inverted"),
    )


@query(
    "fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(sin(l_discount) AS FLOAT) AS s,
           CAST(cos(l_discount) AS FLOAT) AS c,
           CAST(tan(l_discount) AS FLOAT) AS t,
           CAST(atan2(l_quantity, l_extendedprice) AS FLOAT) AS a2,
           CAST(degrees(l_discount) AS FLOAT) AS deg,
           CAST(radians(l_quantity) AS FLOAT) AS rad
    FROM lineitem
    """,
)
def fn_trig(spark, sf_dir):
    """Trigonometric family (§2.H extra). libm-vs-JVM results can
    differ by 1 ulp, so outputs are float-stabilized like the fn_math
    transcendentals (module docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    d, q, p = F.col("l_discount"), F.col("l_quantity"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sin(d).cast("float").alias("s"),
        F.cos(d).cast("float").alias("c"),
        F.tan(d).cast("float").alias("t"),
        F.atan2(q, p).cast("float").alias("a2"),
        F.degrees(d).cast("float").alias("deg"),
        F.radians(q).cast("float").alias("rad"),
    )


@query(
    "fn_string_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_brand) AS INTEGER) AS lev_brand,
           CAST(levenshtein(p_name, reverse(p_name)) AS INTEGER)
             AS lev_palin,
           translate(p_brand, '#', '_') AS brand_t,
           reverse(p_type) AS type_rev,
           repeat(left(p_type, 2), 2) AS type_rep,
           left(p_name, 8) AS name_l,
           right(p_name, 4) AS name_r
    FROM part
    """,
)
def fn_string_distance(spark, sf_dir):
    """String-distance + manipulation family (§2.H1 extension):
    levenshtein — the verify primitive of fuzzy dedup — plus
    translate/reverse/repeat/left/right. All JVM built-ins with
    identical semantics in DuckDB."""
    p = load_table(spark, sf_dir, "part")
    name, brand, ptype = F.col("p_name"), F.col("p_brand"), F.col("p_type")
    return p.select(
        "p_partkey",
        F.levenshtein(name, brand).alias("lev_brand"),
        F.levenshtein(name, F.reverse(name)).alias("lev_palin"),
        F.translate(brand, "#", "_").alias("brand_t"),
        F.reverse(ptype).alias("type_rev"),
        F.repeat(F.substring(ptype, 1, 2), 2).alias("type_rep"),
        F.substring(name, 1, 8).alias("name_l"),
        name.substr(F.length(name) - 3, F.lit(4)).alias("name_r"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([0-9]+)', 1) AS first_num,
           CAST(len(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
             AS n_no_vowels,
           regexp_matches(text, '[0-9]{2,}') AS has_long_num,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
             AS n_alpha_runs
    FROM documents
    """,
)
def fn_regexp(spark, sf_dir):
    """§2.H regex family: extract / global replace / match test /
    extract-all count. Patterns stay within the common subset of
    Java regex (Spark) and RE2 (DuckDB) — character classes and
    bounded repetition — so both engines tokenize identically.
    Scan-bound scalar expressions; whole-stage codegen, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([0-9]+)", 1).alias("first_num"),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).alias(
            "n_no_vowels"
        ),
        F.col("text").rlike(r"[0-9]{2,}").alias("has_long_num"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"([A-Za-z]+)"), 1)
        ).alias("n_alpha_runs"),
    )


@query(
    "fn_higher_order",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents)
    SELECT doc_id,
           len(list_filter(ws, x -> len(x) > 4)) AS n_long,
           CAST(list_aggregate(list_transform(ws, x -> len(x)), 'sum')
                AS BIGINT) AS total_len,
           CASE WHEN len(list_filter(ws, x -> x = 'error')) > 0
                THEN true ELSE false END AS has_error,
           CASE WHEN len(list_filter(ws, x -> len(x) = 0)) = 0
                THEN true ELSE false END AS all_nonempty,
           array_to_string(list_transform(ws[1:3], x -> upper(x)), '-')
             AS head_upper
    FROM w
    """,
)
def fn_higher_order(spark, sf_dir):
    """The array higher-order-function family in one graded pass:
    filter, transform+aggregate (a fold), exists, forall, and
    slice+transform — all JVM-codegen'd lambdas, zero Python, the
    §2.H5 tools that keep per-row array logic OUT of UDFs. DuckDB's
    list_* family mirrors each (exists/forall expressed as filter
    counts there)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(ws, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(ws, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_len"),
        F.exists(ws, lambda x: x == "error").alias("has_error"),
        F.forall(ws, lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.array_join(
            F.transform(F.slice(ws, 1, 3), lambda x: F.upper(x)), "-"
        ).alias("head_upper"),
    )


@query(
    "fn_collation",
    oracle="""
    SELECT lower(event_type) AS et_norm, count(*) AS n,
           min(event_id) AS first_id
    FROM events
    GROUP BY lower(event_type)
    """,
)
def fn_collation(spark, sf_dir):
    """Collation-aware grouping (Spark 4): grouping on a
    UTF8_LCASE-collated column folds case at the COLLATION level —
    no lower() rewrite of the data, and the collation travels with
    the column through joins and aggregates. The oracle is the
    lower()-normalized equivalent (DuckDB's NOCASE collation golfs
    the same result); output normalizes for the hash compare."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr("event_type COLLATE UTF8_LCASE").alias("et"),
            "event_id",
        )
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("first_id"),
        )
        .select(
            F.lower(F.col("et")).cast("string").alias("et_norm"),
            "n", "first_id",
        )
    )


@query(
    "fn_try_errors",
    oracle="""
    SELECT event_id,
           value / nullif(CAST(event_id % 5 AS DOUBLE), 0.0)
             AS safe_div,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
             AS k_int,
           TRY_CAST(event_type AS INTEGER) AS bad_int,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE round(value / CAST(event_id % 5 AS DOUBLE), 6)
           END AS safe_div_r
    FROM events
    """,
)
def fn_try_errors(spark, sf_dir):
    """ANSI-mode error-safe functions (§2.H extra): under Spark 4's
    ANSI defaults, division by zero and bad casts THROW — the try_*
    family is the sanctioned way to get SQL-classic NULL semantics
    per-expression instead of disabling ANSI globally. try_divide
    (zero divisors → NULL), try_cast on a JSON-extracted field and
    on a hopeless string. Scan-local; DuckDB's nullif/TRY_CAST
    mirror each."""
    ev = load_table(spark, sf_dir, "events")
    denom = (F.col("event_id") % 5).cast("double")
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), F.when(denom == 0.0, None)
                     .otherwise(denom)).alias("safe_div"),
        F.expr("try_cast(get_json_object(props, '$.k') AS int)")
        .alias("k_int"),
        F.expr("try_cast(event_type AS int)").alias("bad_int"),
        F.round(F.try_divide(F.col("value"),
                             F.when(denom == 0.0, None)
                             .otherwise(denom)), 6).alias("safe_div_r"),
    )


@query(
    "fn_url",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS qlang,
           replace(substr(text, 1, 11), ' ', '+') AS enc,
           substr(text, 1, 11) AS roundtrip
    FROM documents
    """,
)
def fn_url(spark, sf_dir):
    """URL function family (§2.H breadth): parse_url component
    extraction (HOST / PATH / a named QUERY parameter) plus
    url_encode/url_decode round-tripping — the normalization pass a
    web-crawl pipeline runs before URL-keyed dedup. URLs are
    constructed from fixture columns, so the oracle can state the
    expected components directly; the encode check exploits that
    document text is strictly [a-z ] (verified), where
    x-www-form-urlencoded is exactly space→'+'. All JVM built-ins,
    shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        "lang",
        F.substring("text", 1, 11).alias("snippet"),
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("qlang"),
        F.url_encode("snippet").alias("enc"),
        F.url_decode(F.url_encode("snippet")).alias("roundtrip"),
    )


@query(
    "fn_crypto",
    oracle="""
    SELECT doc_id,
           sha256(text) AS sha,
           base64(CAST(text AS BLOB)) AS b64,
           text AS aes_roundtrip
    FROM documents
    """,
)
def fn_crypto(spark, sf_dir):
    """Cryptographic / encoding functions (§2.H breadth): SHA-256
    content addressing (the digest layer under dataset manifests and
    dedup ledgers), base64 transport encoding, and an AES-ECB
    encrypt→decrypt round trip proving the cipher pair inverts (ECB
    chosen because GCM's random IV is nondeterministic by design;
    real deployments use GCM — the round-trip contract is what's
    graded, and its oracle is simply the original text). SHA-256 and
    base64 outputs are bit-compared against DuckDB's
    implementations."""
    d = load_table(spark, sf_dir, "documents")
    key = "0123456789abcdef"
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("sha"),
        # Spark's base64 MIME-chunks long output with CRLF every 76
        # chars (java.util.Base64 MIME encoder); strip to the RFC 4648
        # canonical form DuckDB emits
        F.regexp_replace(
            F.base64(F.col("text").cast("binary")), "[\\r\\n]", ""
        ).alias("b64"),
        F.expr(
            f"CAST(aes_decrypt(aes_encrypt(text, '{key}', 'ECB'),"
            f" '{key}', 'ECB') AS STRING)"
        ).alias("aes_roundtrip"),
    )


@query(
    "fn_xpath",
    oracle="""
    SELECT event_id,
           CAST(event_id AS VARCHAR) AS x_id,
           event_type AS x_type,
           user_id AS x_user
    FROM events
    """,
)
def fn_xpath(spark, sf_dir):
    """XPath extraction functions (§2.H breadth, pairing with the
    source_xml connector): xpath_string / xpath_long pull fields out
    of embedded XML fragments — the legacy-feed parsing path when
    payloads arrive as XML strings inside a column rather than as
    whole documents. The fragment is built from fixture columns
    ([a-z] event types — no escaping needed), so the oracle states
    the expected extractions directly from the source columns."""
    ev = load_table(spark, sf_dir, "events")
    frag = F.concat(
        F.lit("<e><id>"),
        F.col("event_id").cast("string"),
        F.lit("</id><t>"),
        F.col("event_type"),
        F.lit("</t><u>"),
        F.col("user_id").cast("string"),
        F.lit("</u></e>"),
    )
    return ev.withColumn("frag", frag).select(
        "event_id",
        F.expr("xpath_string(frag, '/e/id')").alias("x_id"),
        F.expr("xpath_string(frag, '/e/t')").alias("x_type"),
        F.expr("xpath_long(frag, '/e/u')").alias("x_user"),
    )


@query(
    "fn_mask",
    oracle="""
    SELECT p_partkey,
           regexp_replace(regexp_replace(regexp_replace(
               p_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked,
           regexp_replace(p_brand, '[0-9]', '*', 'g') AS brand_masked
    FROM part
    """,
)
def fn_mask(spark, sf_dir):
    """Data-masking functions (§2.H breadth, the display-layer
    complement of llm_pii_scrub's removal pass): mask() shape-
    preserving redaction (upper→X, lower→x, digit→n) and a custom
    digit mask. DuckDB has no mask(), so the oracle states the
    character-class semantics as a regexp chain — which also
    documents exactly what mask() does."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("mask(p_name)").alias("masked"),
        F.expr("mask(p_brand, NULL, NULL, '*', NULL)").alias(
            "brand_masked"
        ),
    )
