"""Named queries over the testdata tables + their ANSI-SQL oracles.

Each entry pairs a PySpark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB SQL string over the same parquet tables, used by
the driver's correctness gate (row-count + schema + order-insensitive
value-hash).  Engineering rules that make cross-engine hashes stable:

* **No floating sums.** Double columns are summed as exact integer cents
  (``CAST(round(x*100) AS BIGINT)``) — float addition is not associative,
  so a partial-aggregated Spark sum and a sequential DuckDB sum would
  differ in the low bits.  Averages divide exact integers at the end.
* **RE2-safe regexes only** in oracle-checked queries (DuckDB is RE2: no
  lookaround), taken from the shared rule/scrub registries so Spark and
  the oracle evaluate byte-identical patterns.
* **md5-derived hashes** for MinHash/SimHash (first 8 hex chars as int) —
  reproducible in ANSI SQL, unlike xxhash64. Production uses
  ``hash_mode="xxhash64"`` (same operators, faster family).
* **Sequential left-fold double dot products** for cosine — bit-identical
  across engines; scores rounded to 6 dp before ranking, ties broken by id.
* Window/limit outputs are made deterministic with total orderings.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.text import (bpe_token_estimate_expr, fingerprint_expr,
                             langid_sql_exprs, langid_struct_expr,
                             token_count_expr)
from .operators.dedup import (lsh_candidate_pairs, minhash_signatures,
                              simhash_expr)
from .operators.similarity import brute_force_topk, cosine_expr
from .rules import GLOBAL_RULES, LOCALIZED_RULES
from .scanner import classify_scores
from .scrub import SCRUB_RULES, scrub_sql_exprs, scrub_text_expr

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cents(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


# RE2-compatible rules (no lookaround) — usable by the DuckDB oracle.
_RE2_UNSAFE = {"mac_address", "us_social_security_number"}
ORACLE_RULES = tuple(r for r in list(GLOBAL_RULES) + list(LOCALIZED_RULES["us"])
                     if r.name not in _RE2_UNSAFE)

_DOC_SCAN_COLS = ["text", "lang", "source"]


# ---------------------------------------------------------------------------
# 1. Relational operator coverage (SURVEY §2.2-2.8)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped aggregate (hash agg, partial+final, exact cents)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(cents("l_quantity")).alias("sum_qty_cents"),
                 F.sum(cents("l_extendedprice")).alias("sum_base_price_cents"),
                 F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                 .alias("sum_disc_price_cents"),
                 F.count("*").alias("count_order")))


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customer_revenue(spark, sf_dir):
    """3-way join (broadcast dims) + top-20 with total ordering."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (orders.join(F.broadcast(cust),
                       orders["o_custkey"] == cust["c_custkey"])
           .join(F.broadcast(nation),
                 cust["c_nationkey"] == nation["n_nationkey"])
           .groupBy("c_custkey", "c_name", "n_name")
           .agg(F.sum(cents("o_totalprice")).alias("revenue_cents"),
                F.count("*").alias("n_orders")))
    return (rev.orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
            .limit(20))


SQL_TOP_CUSTOMER = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT 20
"""


def q_latest_event_per_user(spark, sf_dir):
    """row_number window — the reference's only window op
    (delta_housekeeping.py:42-47) in its rebuilt form."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type",
                    F.unix_timestamp("ts").alias("ts_epoch")))


SQL_LATEST_EVENT = """
SELECT user_id, event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.unix_timestamp(F.date_trunc("hour", "ts"))
                       .alias("hour_epoch"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(cents("value")).alias("sum_value_cents")))


SQL_EVENTS_HOURLY = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


def q_event_props_extract(spark, sf_dir):
    """JSON-ish scalar extraction (reference to_json/named_struct family,
    dx.py:256-272, inverted) + grouped sum."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("int")
    return (ev.withColumn("k", k).groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("k").cast("long")).alias("sum_k"),
                 F.max("k").alias("max_k")))


SQL_EVENT_PROPS = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
       MAX(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER)) AS max_k
FROM events GROUP BY event_type
"""


def q_customer_segments(spark, sf_dir):
    """F.when gate chains (shape of reference delta_housekeeping.py:251-363)."""
    cust = _t(spark, sf_dir, "customer")
    seg = (F.when(F.col("c_acctbal") < 0, "negative")
           .when(F.col("c_acctbal") < 3000, "low")
           .when(F.col("c_acctbal") < 7000, "mid")
           .otherwise("high"))
    return (cust.withColumn("segment", seg)
            .groupBy("segment", "c_mktsegment")
            .agg(F.count("*").alias("n_customers"),
                 F.sum(cents("c_acctbal")).alias("sum_acctbal_cents")))


SQL_CUSTOMER_SEGMENTS = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS segment,
       c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents
FROM customer GROUP BY 1, 2
"""


def q_documents_melt(spark, sf_dir):
    """Wide→long melt — the reference's central stack() trick
    (scanner.py:328-336) as the native unpivot operator."""
    docs = _t(spark, sf_dir, "documents")
    return docs.unpivot("doc_id", ["lang", "source"], "column_name", "value")


SQL_DOCUMENTS_MELT = """
SELECT doc_id, 'lang' AS column_name, lang AS value FROM documents
UNION ALL
SELECT doc_id, 'source' AS column_name, source AS value FROM documents
"""


def q_search_documents(spark, sf_dir):
    """Value search across string columns (reference dx.search, dx.py:236-282):
    melt + filter on the literal term."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.unpivot("doc_id", ["lang", "source"], "column_name", "value")
            .filter(F.col("value") == "en"))


SQL_SEARCH_DOCUMENTS = """
SELECT * FROM (
  SELECT doc_id, 'lang' AS column_name, lang AS value FROM documents
  UNION ALL
  SELECT doc_id, 'source' AS column_name, source AS value FROM documents
) WHERE value = 'en'
"""


def q_customers_without_orders(spark, sf_dir):
    """Left-anti join (absent from the reference — completes the join
    inventory)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (cust.join(orders, cust["c_custkey"] == orders["o_custkey"],
                      "left_anti")
            .select("c_custkey", "c_name", "c_mktsegment"))


SQL_CUST_NO_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_parts_with_lineitems(spark, sf_dir):
    """Left-semi join + aggregate on the surviving side."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (part.join(li, part["p_partkey"] == li["l_partkey"], "left_semi")
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_parts"),
                 F.sum(cents("p_retailprice")).alias("sum_price_cents")))


SQL_PARTS_SEMI = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""


def q_user_sessions(spark, sf_dir):
    """Sessionization: lag + conditional cumulative sum over the per-user
    time window (gap > 30 min starts a new session), then per-session
    aggregates — the classic streaming-adjacent batch window pattern."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional-second epoch on both engines (unix_timestamp truncates,
    # which could flip a gap test right at the boundary); parquet ts is
    # TIMESTAMP_NTZ → go through timestamp to reach double
    epoch = lambda c: c.cast("timestamp").cast("double")
    gap = epoch(F.col("ts")) - epoch(F.lag("ts").over(w))
    with_s = (ev
              .withColumn("new_session",
                          F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
              .withColumn("session_idx",
                          F.sum("new_session").over(
                              w.rowsBetween(Window.unboundedPreceding, 0))))
    return (with_s.groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
                 F.unix_timestamp(F.max("ts")).alias("session_end_epoch")))


SQL_USER_SESSIONS = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
       CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end_epoch
FROM s GROUP BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# 2. Scan-and-classify engine queries
# ---------------------------------------------------------------------------

def q_scan_documents(spark, sf_dir):
    """The flagship DiscoverX scan (scanner.py:286-345 semantics) over the
    documents table, RE2-safe rule subset, no sampling (full table)."""
    docs = _t(spark, sf_dir, "documents")
    return classify_scores(docs, ORACLE_RULES, columns=_DOC_SCAN_COLS,
                           sample_size=None, table_catalog="main",
                           table_schema="testdata", table_name="documents")


def _sql_scan_documents() -> str:
    arms = []
    for col in _DOC_SCAN_COLS:
        for r in ORACLE_RULES:
            pat = r.pattern.replace("'", "''")
            arms.append(
                "SELECT 'main' AS table_catalog, 'testdata' AS table_schema, "
                "'documents' AS table_name, "
                f"'{col}' AS column_name, '{r.name}' AS class_name, "
                f"avg(CAST(regexp_matches({col}, '{pat}') AS INT)) AS score "
                "FROM documents")
    return "\nUNION ALL\n".join(arms)


def q_scrub_documents(spark, sf_dir):
    """Per-doc scrub (JVM chain, SQL profile) + per-class counts on the raw
    text (email + ip_v4 as representative counters)."""
    docs = _t(spark, sf_dir, "documents")
    email_pat = next(r.sql_pattern for r in SCRUB_RULES if r.class_name == "email")
    ip_pat = next(r.sql_pattern for r in SCRUB_RULES if r.class_name == "ip_v4")
    return docs.select(
        "doc_id",
        scrub_text_expr("text").alias("scrubbed_text"),
        F.size(F.regexp_extract_all("text", F.lit(f"({email_pat})"), 1))
        .cast("long").alias("n_email"),
        F.size(F.regexp_extract_all("text", F.lit(f"({ip_pat})"), 1))
        .cast("long").alias("n_ip"),
    )


def _sql_scrub_documents() -> str:
    email_pat = next(r.sql_pattern for r in SCRUB_RULES if r.class_name == "email")
    ip_pat = next(r.sql_pattern for r in SCRUB_RULES if r.class_name == "ip_v4")
    return f"""
SELECT doc_id,
       {scrub_sql_exprs('text')} AS scrubbed_text,
       CAST(len(regexp_extract_all(text, '({email_pat})', 1)) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '({ip_pat})', 1)) AS BIGINT) AS n_ip
FROM documents
"""


def q_quality_gates_documents(spark, sf_dir):
    """Keep/drop heuristic gates over documents (pipeline gate shapes)."""
    docs = _t(spark, sf_dir, "documents")
    n_tokens = token_count_expr("text").cast("long")
    n_alpha = F.size(F.regexp_extract_all("text", F.lit("([A-Za-z])"), 1)).cast("long")
    n_chars = F.length("text").cast("long")
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    out = docs.select("doc_id", n_tokens.alias("n_tokens"),
                      alpha_ratio.alias("alpha_ratio"))
    keep = (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 1000) & \
           (F.col("alpha_ratio") >= 0.5)
    reason = (F.when(F.col("n_tokens") < 5, "too_short")
              .when(F.col("n_tokens") > 1000, "too_long")
              .when(F.col("alpha_ratio") < 0.5, "low_alpha")
              .otherwise("ok"))
    return out.select("doc_id", "n_tokens", "alpha_ratio",
                      keep.alias("keep"), reason.alias("reason"))


SQL_QUALITY_GATES = r"""
WITH f AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '(\S+)', 1)) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '([A-Za-z])', 1)) AS BIGINT)::DOUBLE
           / greatest(CAST(length(text) AS BIGINT), 1)::DOUBLE AS alpha_ratio
  FROM documents)
SELECT doc_id, n_tokens, alpha_ratio,
       (n_tokens >= 5 AND n_tokens <= 1000 AND alpha_ratio >= 0.5) AS keep,
       CASE WHEN n_tokens < 5 THEN 'too_short'
            WHEN n_tokens > 1000 THEN 'too_long'
            WHEN alpha_ratio < 0.5 THEN 'low_alpha'
            ELSE 'ok' END AS reason
FROM f
"""


def q_langid_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    lid = langid_struct_expr("text")
    return docs.select("doc_id", lid["lang"].alias("lang_detected"),
                       lid["lang_score"].alias("lang_score"))


def _sql_langid_documents() -> str:
    lang_sql, score_sql = langid_sql_exprs("text")
    return (f"SELECT doc_id, {lang_sql} AS lang_detected, "
            f"{score_sql} AS lang_score FROM documents")


def q_token_stats_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_expr("text").cast("long").alias("n_tokens"),
        bpe_token_estimate_expr("text").cast("long").alias("n_pieces"),
        F.length("text").cast("long").alias("n_chars_calc"),
        fingerprint_expr("text").alias("fingerprint"))


SQL_TOKEN_STATS = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '(\S+)', 1)) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '([A-Za-z0-9]+|[^A-Za-z0-9\s])', 1)) AS BIGINT) AS n_pieces,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def q_dedup_exact_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (docs.select(fingerprint_expr("text").alias("fingerprint"),
                        F.col("doc_id"))
            .groupBy("fingerprint")
            .agg(F.min("doc_id").alias("canonical_id"),
                 F.count("*").alias("dup_count")))


SQL_DEDUP_EXACT = r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS canonical_id, COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 3. MinHash / SimHash / similarity (md5 hash family for oracle parity)
# ---------------------------------------------------------------------------

_MH_K = 8


def q_minhash_signatures_documents(spark, sf_dir):
    # testdata ships one row-group per table → repartition for parallelism
    # (row-level projection; results are partitioning-invariant)
    docs = _t(spark, sf_dir, "documents").repartition(32)
    return minhash_signatures(docs, "text", "doc_id", k=_MH_K, shingle_n=3,
                              hash_mode="md5")


def _sql_minhash_sigs(source_sql: str = "documents",
                      id_expr: str = "doc_id") -> str:
    mins = ",\n  ".join(
        f"list_min(list_transform(s, x -> ('0x'||substr(md5(x||'#{i}'),1,8))::BIGINT)) AS mh_{i}"
        for i in range(_MH_K))
    return rf"""
WITH toks AS (
  SELECT {id_expr} AS id, regexp_extract_all(lower(text), '(\S+)', 1) AS t
  FROM {source_sql}
), sh AS (
  SELECT id,
    CASE WHEN len(t) >= 3
         THEN list_transform(range(1, len(t)-1),
                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         ELSE [array_to_string(t, ' ')] END AS s
  FROM toks)
SELECT id, {mins} FROM sh
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """LSH candidate pairs over documents ∪ clone(documents): every doc must
    pair with its clone (id+100000), plus any genuine band collisions."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").repartition(32)
    both = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    sigs = minhash_signatures(both, "text", "doc_id", k=_MH_K, shingle_n=3,
                              hash_mode="md5")
    return lsh_candidate_pairs(sigs, bands=4, k=_MH_K)


def _sql_minhash_lsh_pairs() -> str:
    sigs = _sql_minhash_sigs(
        "(SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents)")
    band_rows = "\nUNION ALL\n".join(
        f"SELECT id, {b} AS band_idx, "
        f"md5(mh_{2*b}::VARCHAR || ',' || mh_{2*b+1}::VARCHAR) AS band_hash FROM sigs"
        for b in range(4))
    return f"""
WITH sigs AS ({sigs}),
bands AS ({band_rows})
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM bands a JOIN bands b USING (band_idx, band_hash)
WHERE a.id < b.id
"""


_SIM_BITS = 16


def q_simhash_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").repartition(32)
    return docs.select("doc_id",
                       simhash_expr("text", bits=_SIM_BITS,
                                    hash_mode="md5").alias("simhash"))


def _sql_simhash_documents() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) >= 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(_SIM_BITS))
    return rf"""
WITH h AS (
  SELECT doc_id, ('0x'||substr(md5(tok||'#0'),1,8))::BIGINT AS hv
  FROM (SELECT doc_id,
               unnest(list_distinct(regexp_extract_all(lower(text), '(\S+)', 1))) AS tok
        FROM documents))
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash
FROM h GROUP BY doc_id
"""


def q_cosine_topk_embeddings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


_SQL_DOT = ("list_reduce(list_transform(range(1, len({a})+1), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            "(x, y) -> x + y)")
_SQL_NORM = ("sqrt(list_reduce(list_transform(range(1, len({a})+1), "
             "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), "
             "(x, y) -> x + y))")


def _sql_cosine_topk() -> str:
    dot = _SQL_DOT.format(a="q.qv", b="c.cv")
    nq = _SQL_NORM.format(a="q.qv")
    nc = _SQL_NORM.format(a="c.cv")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         round({dot} / ({nq} * {nc}), 6) AS cosine
  FROM c, q WHERE neighbor_id <> query_id)
SELECT query_id, neighbor_id, cosine,
       CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM s)
WHERE rank <= 10
"""


def q_embedding_neardup_clones(spark, sf_dir):
    """Exact near-dup detection validated on a planted clone set."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    both = emb.unionByName(
        emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    a = both.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = both.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
                    .alias("cosine"))
            .filter(F.col("cosine") >= 0.99))


def _sql_embedding_neardup() -> str:
    dot = _SQL_DOT.format(a="a.va", b="b.vb")
    na = _SQL_NORM.format(a="a.va")
    nb = _SQL_NORM.format(a="b.vb")
    return f"""
WITH both_v AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 50),
a AS (SELECT vec_id AS id_a, embedding AS va FROM both_v),
b AS (SELECT vec_id AS id_b, embedding AS vb FROM both_v)
SELECT id_a, id_b, round({dot} / ({na} * {nb}), 6) AS cosine
FROM a, b
WHERE id_a < id_b AND round({dot} / ({na} * {nb}), 6) >= 0.99
"""


# ---------------------------------------------------------------------------
# 4. Transcripts pipeline (no SQL oracle — UDF-backed, rows-only check)
# ---------------------------------------------------------------------------

_TP_CONVS = 300


def q_transcripts_pipeline(spark, sf_dir):
    """Flagship north-rule pipeline over deterministic generated transcripts.
    Output is canonicalized for the driver's hasher: drop_reasons joined
    with ',', pii_counts as sorted-key JSON."""
    from .pipeline import decide
    from .transcripts import generate_transcripts
    turns = generate_transcripts(spark, _TP_CONVS, seed=42)
    d = decide(turns)
    return d.select(
        "conv_id", "turn_idx", "role", "lang", "lang_score", "perplexity",
        F.to_json(F.map_from_entries(F.array_sort(F.map_entries("pii_counts"))))
        .alias("pii_counts"),
        "toxicity_score", "keep",
        F.array_join("drop_reasons", ",").alias("drop_reasons"),
        "scrubbed_text")


def _sql_lit(v) -> str:
    """Render a Python value as a type-stable DuckDB literal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # decimal literals parse as DECIMAL in DuckDB; round-trip through a
        # string cast for an exact binary64
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _sql_transcripts_pipeline() -> str:
    """Expected-output oracle: the driver-local reference implementation
    (pipeline.decide_pandas — same feature closure, independent gate logic)
    over the identical deterministic input, inlined as VALUES."""
    from .pipeline import decide_pandas
    from .transcripts import generate_transcripts_pandas

    expected = decide_pandas(generate_transcripts_pandas(_TP_CONVS, seed=42))
    cols = list(expected.columns)
    rows = ",\n".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")"
        for row in expected.itertuples(index=False, name=None))
    return (f"SELECT * FROM (VALUES\n{rows}\n) AS t({', '.join(cols)})")


def q_transcripts_conversation_stats(spark, sf_dir):
    from .operators.convagg import conversation_stats
    from .transcripts import generate_transcripts
    turns = generate_transcripts(spark, 300, seed=42)
    return conversation_stats(turns, salt_buckets=8)


def q_perplexity_documents(spark, sf_dir):
    from .functions.perplexity import make_perplexity_udf
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id",
                       F.round(make_perplexity_udf()(F.col("text")), 6)
                       .alias("perplexity"))


def q_minhash_neardup_xxhash(spark, sf_dir):
    """Production-path MinHash near-dup (xxhash64 family, k=16, verified
    signature agreement) over documents ∪ clones — every doc must pair
    with its clone at est_jaccard 1.0."""
    from .operators.dedup import minhash_near_duplicates
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").repartition(32)
    both = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return minhash_near_duplicates(both, "text", "doc_id", k=16, bands=8,
                                   threshold=0.7, hash_mode="xxhash64")


def q_simhash_neardup(spark, sf_dir):
    from .operators.dedup import simhash_near_duplicates
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").repartition(32)
    both = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return simhash_near_duplicates(both, "text", "doc_id", bits=16,
                                   max_hamming=0)


def q_jaccard_verify_pairs(spark, sf_dir):
    """Exact n-gram Jaccard verification of LSH candidates (scale shape:
    candidates from banding, exact check only on the candidate set)."""
    from .operators.dedup import (jaccard_pairs, lsh_candidate_pairs,
                                  minhash_signatures)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").repartition(32)
    both = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    sigs = minhash_signatures(both, "text", "doc_id", k=16, hash_mode="xxhash64")
    cands = lsh_candidate_pairs(sigs, bands=8, k=16)
    return jaccard_pairs(both, "text", "doc_id", candidates=cands,
                         threshold=0.9)


def q_ann_lsh_topk(spark, sf_dir):
    """Approximate top-k via hyperplane LSH buckets (multi-probe)."""
    from .operators.similarity import lsh_topk
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=10,
                    n_planes=10, seed=42, dim=64)


def q_ivf_assign(spark, sf_dir):
    """IVF coarse quantization: nearest-centroid assignment (centroids =
    first 16 vectors)."""
    from .operators.similarity import ivf_assign
    emb = _t(spark, sf_dir, "embeddings")
    return ivf_assign(emb, emb.filter(F.col("vec_id") < 16))


def q_ivf_topk(spark, sf_dir):
    """IVF search: probe the 4 nearest coarse cells per query."""
    from .operators.similarity import ivf_topk
    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 16),
                    emb.filter(F.col("vec_id") < 3), k=5, probes=4)


def q_conversation_fingerprints(spark, sf_dir):
    from .operators.convagg import conversation_fingerprints
    from .transcripts import generate_transcripts
    return conversation_fingerprints(generate_transcripts(spark, 300, seed=42))


def q_dedup_conversations(spark, sf_dir):
    """Conversation-level exact dedup over generated transcripts plus one
    cloned conversation block (clones must be removed)."""
    from .operators.convagg import dedup_conversations
    from .transcripts import generate_transcripts
    turns = generate_transcripts(spark, 200, seed=42)
    clones = turns.filter(F.col("conv_id") < "conv-42-00000050") \
        .withColumn("conv_id", F.concat(F.lit("zz-"), F.col("conv_id")))
    return dedup_conversations(turns.unionByName(clones))


def q_conversation_near_duplicates(spark, sf_dir):
    """Conv-level MinHash near-dup: transcripts plus cloned conversations
    with one turn dropped (near- but not exact-duplicates)."""
    from .operators.convagg import conversation_near_duplicates
    from .transcripts import generate_transcripts
    turns = generate_transcripts(spark, 150, seed=42)
    near_clones = (turns.filter(F.col("conv_id") < "conv-42-00000040")
                   .filter(F.col("turn_idx") > 0)
                   .withColumn("conv_id", F.concat(F.lit("zz-"), F.col("conv_id"))))
    return conversation_near_duplicates(turns.unionByName(near_clones),
                                        threshold=0.6)


def q_embedding_lsh_neardup(spark, sf_dir):
    """Bucketed embedding near-dup over embeddings ∪ clones."""
    from .operators.similarity import lsh_near_duplicates
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    both = emb.unionByName(
        emb.filter(F.col("vec_id") < 100)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    return lsh_near_duplicates(both, threshold=0.99, dim=64)


def q_role_alternation(spark, sf_dir):
    from .operators.convagg import role_alternation_violations
    from .transcripts import generate_transcripts
    return role_alternation_violations(generate_transcripts(spark, 300, seed=42))


def q_multimodal_features(spark, sf_dir):
    """Binary media plumbing: deterministic payloads → mapInPandas feature
    kernel (decode stubbed; batch shape real)."""
    from .operators.multimodal import attach_fake_media, decode_image_features
    media = attach_fake_media(spark.range(500), "id", kind="image")
    return decode_image_features(media)


def q_scan_transcripts(spark, sf_dir):
    """DiscoverX scan applied to the transcripts table itself (classifies
    the text/role/tool columns against the full US rule set)."""
    from .transcripts import generate_transcripts
    turns = generate_transcripts(spark, 300, seed=42)
    rules = list(GLOBAL_RULES) + list(LOCALIZED_RULES["us"])
    return classify_scores(turns, rules, columns=["conv_id", "role", "text"],
                           sample_size=None, table_catalog="main",
                           table_schema="gen", table_name="transcripts")


def q_union_distinct_event_types(spark, sf_dir):
    """Union fold + DISTINCT (reference msql.py:144 / table_info.py:168)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("value") >= 50).select("event_type")
    b = ev.filter(F.col("user_id") % 2 == 0).select("event_type")
    return a.unionByName(b).distinct()


SQL_UNION_DISTINCT = """
SELECT DISTINCT event_type FROM (
  SELECT event_type FROM events WHERE value >= 50
  UNION ALL
  SELECT event_type FROM events WHERE user_id % 2 = 0)
"""


def q_segment_nations_rollup(spark, sf_dir):
    """collect_set → sorted array rollup (reference scanner.py:194-207
    collect_list(struct) analog), joined across customer⋈nation; emitted
    as a joined string for cross-engine hash stability."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (cust.join(F.broadcast(nation),
                      cust["c_nationkey"] == nation["n_nationkey"])
            .groupBy("c_mktsegment")
            .agg(F.array_join(F.sort_array(F.collect_set("n_name")), ",")
                 .alias("nations"),
                 F.count("*").alias("n_customers")))


SQL_SEGMENT_NATIONS = """
SELECT c_mktsegment,
       string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_mktsegment
"""


def q_row_json_export(spark, sf_dir):
    """Whole-row JSON serialization (reference dx.py:270 to_json(struct(*))
    — the GDPR right-of-access extract)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.to_json(F.struct("c_custkey", "c_name", "c_mktsegment"))
        .alias("row_json"))


SQL_ROW_JSON = """
SELECT c_custkey,
       to_json(struct_pack(c_custkey := c_custkey, c_name := c_name,
                           c_mktsegment := c_mktsegment)) AS row_json
FROM customer
"""


def q_scan_events_all_columns(spark, sf_dir):
    """Cast-to-string scan of non-string columns (reference
    explorer.py:250-253 'stack all columns as string' variant)."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("event_id_s"),
        F.col("user_id").cast("string").alias("user_id_s"),
        "event_type", "props")
    rules = [r for r in ORACLE_RULES
             if r.name in ("integer_number", "decimal_number", "url", "email")]
    return classify_scores(ev, rules, columns=["event_id_s", "user_id_s",
                                               "event_type", "props"],
                           sample_size=None, table_catalog="main",
                           table_schema="testdata", table_name="events")


def _sql_scan_events_all_columns() -> str:
    cols = {"event_id_s": "CAST(event_id AS VARCHAR)",
            "user_id_s": "CAST(user_id AS VARCHAR)",
            "event_type": "event_type", "props": "props"}
    names = ("integer_number", "decimal_number", "url", "email")
    arms = []
    for alias, expr in cols.items():
        for r in ORACLE_RULES:
            if r.name not in names:
                continue
            pat = r.pattern.replace("'", "''")
            arms.append(
                "SELECT 'main' AS table_catalog, 'testdata' AS table_schema, "
                "'events' AS table_name, "
                f"'{alias}' AS column_name, '{r.name}' AS class_name, "
                f"avg(CAST(regexp_matches({expr}, '{pat}') AS INT)) AS score "
                "FROM events")
    return "\nUNION ALL\n".join(arms)


def q_table_metadata(spark, sf_dir):
    """Metadata scan (reference InfoFetcher, table_info.py:107-348): list
    every testdata table's columns + types from the parquet footers."""
    rows = []
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        df = _t(spark, sf_dir, name)
        for i, fld in enumerate(df.schema.fields):
            rows.append(("main", "testdata", name, fld.name,
                         fld.dataType.simpleString(), i))
    return spark.createDataFrame(
        rows, "table_catalog string, table_schema string, table_name string, "
              "column_name string, data_type string, ordinal int")


def q_housekeeping(spark, sf_dir):
    """File-layout housekeeping stats + recommendation gates (reference
    delta_housekeeping.py) over a generated partitioned dataset."""
    import tempfile

    from .sources import housekeeping_recommendations, table_file_stats
    from .transcripts import generate_transcripts

    tmp = tempfile.mkdtemp(prefix="dxs_hk_")
    df = generate_transcripts(spark, 200, seed=42)
    df.withColumn("part", F.pmod(F.xxhash64("conv_id"), F.lit(4))) \
      .repartition(2, "part").write.mode("overwrite") \
      .partitionBy("part").parquet(tmp)
    return housekeeping_recommendations(table_file_stats(spark, tmp, "hk"))


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: Dict[str, Tuple[QueryFn, Optional[str]]] = {
    # relational coverage
    "pricing_summary": (q_pricing_summary, SQL_PRICING),
    "top_customer_revenue": (q_top_customer_revenue, SQL_TOP_CUSTOMER),
    "latest_event_per_user": (q_latest_event_per_user, SQL_LATEST_EVENT),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "event_props_extract": (q_event_props_extract, SQL_EVENT_PROPS),
    "customer_segments": (q_customer_segments, SQL_CUSTOMER_SEGMENTS),
    "documents_melt": (q_documents_melt, SQL_DOCUMENTS_MELT),
    "customers_without_orders": (q_customers_without_orders, SQL_CUST_NO_ORDERS),
    "parts_with_lineitems": (q_parts_with_lineitems, SQL_PARTS_SEMI),
    "user_sessions": (q_user_sessions, SQL_USER_SESSIONS),
    "search_documents": (q_search_documents, SQL_SEARCH_DOCUMENTS),
    # scan-and-classify engine
    "scan_documents": (q_scan_documents, _sql_scan_documents()),
    "scrub_documents": (q_scrub_documents, _sql_scrub_documents()),
    "quality_gates_documents": (q_quality_gates_documents, SQL_QUALITY_GATES),
    "langid_documents": (q_langid_documents, _sql_langid_documents()),
    "token_stats_documents": (q_token_stats_documents, SQL_TOKEN_STATS),
    # dedup / similarity
    "dedup_exact_documents": (q_dedup_exact_documents, SQL_DEDUP_EXACT),
    "minhash_signatures_documents": (q_minhash_signatures_documents,
                                     _sql_minhash_sigs()),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, _sql_minhash_lsh_pairs()),
    "simhash_documents": (q_simhash_documents, _sql_simhash_documents()),
    "cosine_topk_embeddings": (q_cosine_topk_embeddings, _sql_cosine_topk()),
    "embedding_neardup_clones": (q_embedding_neardup_clones,
                                 _sql_embedding_neardup()),
    # transcripts pipeline (expected-output VALUES oracle: driver-local
    # reference implementation over the identical deterministic input)
    "transcripts_pipeline": (q_transcripts_pipeline, _sql_transcripts_pipeline()),
    "transcripts_conversation_stats": (q_transcripts_conversation_stats, None),
    "perplexity_documents": (q_perplexity_documents, None),
    # scale-path variants + remaining operators (rows-only checks)
    "minhash_neardup_xxhash": (q_minhash_neardup_xxhash, None),
    "simhash_neardup": (q_simhash_neardup, None),
    "jaccard_verify_pairs": (q_jaccard_verify_pairs, None),
    "ann_lsh_topk": (q_ann_lsh_topk, None),
    "ivf_assign": (q_ivf_assign, None),
    "ivf_topk": (q_ivf_topk, None),
    "conversation_fingerprints": (q_conversation_fingerprints, None),
    "dedup_conversations": (q_dedup_conversations, None),
    "conversation_near_duplicates": (q_conversation_near_duplicates, None),
    "embedding_lsh_neardup": (q_embedding_lsh_neardup, None),
    "role_alternation": (q_role_alternation, None),
    "multimodal_features": (q_multimodal_features, None),
    "scan_transcripts": (q_scan_transcripts, None),
    # remaining SURVEY §2 rows
    "union_distinct_event_types": (q_union_distinct_event_types,
                                   SQL_UNION_DISTINCT),
    "segment_nations_rollup": (q_segment_nations_rollup, SQL_SEGMENT_NATIONS),
    "row_json_export": (q_row_json_export, SQL_ROW_JSON),
    "scan_events_all_columns": (q_scan_events_all_columns,
                                _sql_scan_events_all_columns()),
    "table_metadata": (q_table_metadata, None),
    "housekeeping": (q_housekeeping, None),
}
