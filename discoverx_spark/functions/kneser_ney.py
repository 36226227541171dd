"""Interpolated Kneser-Ney trigram LM — the actual KenLM smoothing
family (Kneser & Ney 1995; Chen & Goodman 1999; Heafield 2011), with
the MODEL AS A DATAFRAME.

Where Stupid Backoff (functions/ngram_lm.py) scores by raw relative
frequency with a fixed back-off penalty, Kneser-Ney discounts the
highest-order counts and redistributes the held-out mass to lower
orders whose statistics are CONTINUATION counts — "how many distinct
contexts does this word complete?" — the property that makes
"Francisco" (frequent but only after "San") score low as a novel
continuation:

    p₃(w | u v) = max(c(uvw) − D, 0) / c'(uv)
                  + D·N₁₊(uv·)/c'(uv) · p₂(w | v)      if uv seen
                = p₂(w | v)                             otherwise
    p₂(w | v)   = max(N₁₊(·vw) − D, 0) / N₁₊(·v·)
                  + D·N(v·)/N₁₊(·v·) · p₁(w)            if ·v· seen
                = p₁(w)                                 otherwise
    p₁(w)       = max(N₁₊(·w) − D, 0) / N₁₊(··)
                  + D·V/N₁₊(··) · 1/(V + 1)

with c'(uv) = Σ_w c(uvw) (the "adjusted" context total — summing the
SAME table the numerators come from keeps every backoff weight exactly
the discount mass D·N/c', and sidesteps the end-of-document edge where
a raw bigram count has no trigram continuation), N₁₊(·vw) = number of
distinct u preceding vw, N₁₊(·v·) = Σ_w N₁₊(·vw), N(v·) = distinct
continuation types of v, N₁₊(·w) = distinct bigram left-contexts of w,
N₁₊(··) = total distinct bigram types, V = distinct continuation
words.  The uniform 1/(V+1) base reserves one "world" for OOV tokens,
so every position scores > 0.  Documents are scored without sentence
markers: position 0 scores p₁, position 1 scores p₂, the rest p₃ —
back-off handles missing context with no special cases.

``discount`` is either a fixed D ∈ (0, 1) applied at every order
(the oracle-certified configuration) or ``"modified"`` — Chen &
Goodman's modified KN, the KenLM default: per order, three discounts
D₁, D₂, D₃₊ estimated from the count-of-counts
(Y = n₁/(n₁+2n₂); D_k = k − (k+1)·Y·n_{k+1}/n_k) and applied by
count value, with the back-off weight carrying the exact removed mass
(D₁·N₁ + D₂·N₂ + D₃₊·N₃₊)/c'.  The estimation scalars are collected
on the driver (≤ 12 longs — metadata-sized); everything else stays
distributed.

Spark shape (same contract as ngram_lm.py):

* **Training** is four vocabulary-bounded aggregations off one
  exploded trigram frame plus one off the bigram frame — map-side
  combined, shuffle bounded by distinct-type counts, never corpus
  size.  The result is ONE unified stats DataFrame (kind, k1, k2, k3,
  v1, v2): persist as parquet, reload anywhere.
* **Scoring** is join-based and 100% JVM-side: the position frame
  (id, pos, w₋₂, w₋₁, w) left-joins the six stat slices (broadcast at
  pruned-model scale; hash-join on gram keys when the model itself is
  huge), one nested-CASE expression evaluates the interpolation
  ladder, and a sorted-position fold gives a deterministic float sum.
  The corpus text never shuffles and no Python worker sees the model.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_sql_expr as _tokens

KN_DISCOUNT = 0.75


_KN_KINDS = ("c3", "ctx3", "n2", "ctx2", "n1", "tot")


def kneser_ney_model(df: DataFrame, text_col: str,
                     min_count: int = 1) -> DataFrame:
    """Train the trigram KN statistics table: one DataFrame with rows
    (kind, k1, k2, k3, v1, v2) —

    ========  ==============  =======================================
    kind      keys            values
    ========  ==============  =======================================
    ``c3``    (u, v, w)       v1 = c(uvw)
    ``ctx3``  (u, v)          v1 = Σ_w c(uvw),  v2 = N₁₊(uv·)
    ``n2``    (v, w)          v1 = N₁₊(·vw)  (distinct u before vw)
    ``ctx2``  (v)             v1 = N₁₊(·v·), v2 = N(v·)
    ``n1``    (w)             v1 = N₁₊(·w)   (distinct v before w)
    ``tot``   ()              v1 = N₁₊(··),  v2 = V
    ========  ==============  =======================================

    The count-of-count columns needed by modified-KN discounting are
    recomputed cheaply from this table at scoring time (three tiny
    aggregations), so the persisted model stays smoothing-agnostic.

    ``min_count`` (default 1 = keep everything, the oracle-certified
    configuration) prunes trigram types with ``c(uvw) < min_count``
    BEFORE the derived statistics are computed, so the pruned model
    stays self-consistent (every ctx3/n2/ctx2 row still aggregates
    exactly the retained c3 rows) — the entropy-pruning stand-in that
    bounds the dominant ``c3`` slice at web scale; scores for pruned
    trigrams redistribute their mass through the backoff ladder, the
    standard pruned-LM approximation."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    # ONE corpus pass for BOTH gram orders (guide §1.2 — was one
    # explode+count per order): every bigram position (t_j, t_{j+1})
    # explodes once carrying its left context u = t_{j-1} (NULL at the
    # document head), one map-side-combined groupBy counts the padded
    # triples, and the trigram counts (u non-null rows) and the bigram
    # occurrence counts (Σ_u per (v, w)) are exact type-bounded rollups
    # of that one table — the corpus is never re-tokenized
    toks = _tokens(text_col)
    n = F.size(toks)
    m = F.greatest(n - 1, F.lit(1))
    zipped = F.arrays_zip(
        F.slice(F.concat(F.array(F.lit(None).cast("string")), toks),
                1, m).alias("u"),
        F.slice(toks, 1, m).alias("v"),
        F.slice(toks, 2, m).alias("w"))
    pos = (df.select(F.explode(F.when(n >= 2, zipped)).alias("s"))
           .select(F.col("s.u").alias("u"), F.col("s.v").alias("v"),
                   F.col("s.w").alias("w")))
    # g is the root of every derived aggregation — cut the lineage so
    # the explode+count runs once, not per consumer
    g = pos.groupBy("u", "v", "w").agg(F.count(F.lit(1)).alias("v1")) \
        .localCheckpoint(eager=False)
    c3 = g.filter(F.col("u").isNotNull())
    if min_count > 1:
        c3 = c3.filter(F.col("v1") >= min_count)
    ctx3 = c3.groupBy("u", "v").agg(F.sum("v1").alias("v1"),
                                    F.count(F.lit(1)).alias("v2"))
    n2 = c3.groupBy("v", "w").agg(F.count(F.lit(1)).alias("v1"))
    ctx2 = n2.groupBy("v").agg(F.sum("v1").alias("v1"),
                               F.count(F.lit(1)).alias("v2"))
    # c2t (bigram occurrence counts) feeds TWO aggregations (n1, tot) —
    # same lineage-cut policy
    c2t = g.groupBy("v", "w").agg(F.sum("v1").alias("v1")) \
        .localCheckpoint(eager=False)
    n1 = c2t.groupBy("w").agg(F.count(F.lit(1)).alias("v1"))
    tot = c2t.agg(F.count(F.lit(1)).alias("v1"),
                  F.count_distinct(F.col("w")).alias("v2"))

    def shape(sdf: DataFrame, kind: str, keys: list) -> DataFrame:
        sel = [F.lit(kind).alias("kind")]
        for slot, k in zip(("k1", "k2", "k3"), keys):
            sel.append(F.col(k).alias(slot))
        for slot in ("k1", "k2", "k3")[len(keys):]:
            sel.append(F.lit(None).cast("string").alias(slot))
        sel.append(F.col("v1").cast("long").alias("v1"))
        sel.append((F.col("v2") if "v2" in sdf.columns else F.lit(None))
                   .cast("long").alias("v2"))
        return sdf.select(*sel)

    out = shape(c3, "c3", ["u", "v", "w"]) \
        .unionByName(shape(ctx3, "ctx3", ["u", "v"])) \
        .unionByName(shape(n2, "n2", ["v", "w"])) \
        .unionByName(shape(ctx2, "ctx2", ["v"])) \
        .unionByName(shape(n1, "n1", ["w"])) \
        .unionByName(shape(tot, "tot", []))
    return out


def _modified_discounts(counts: DataFrame, val_col: str) -> tuple:
    """(D1, D2, D3p) from the count-of-counts of ``val_col`` — Chen &
    Goodman eq. 26: Y = n₁/(n₁+2n₂), D_k = k − (k+1)·Y·n_{k+1}/n_k.
    Falls back to the fixed default when a needed n_k is zero (tiny or
    degenerate corpora), clamped to [0, k] so max(c−D, 0) never goes
    negative and weights stay non-negative."""
    row = counts.agg(
        F.sum(F.when(F.col(val_col) == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col(val_col) == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col(val_col) == 3, 1).otherwise(0)).alias("n3"),
        F.sum(F.when(F.col(val_col) == 4, 1).otherwise(0)).alias("n4"),
    ).collect()[0]
    n1, n2, n3, n4 = (row[k] or 0 for k in ("n1", "n2", "n3", "n4"))
    if n1 == 0 or n2 == 0:
        return (KN_DISCOUNT, KN_DISCOUNT, KN_DISCOUNT)
    y = n1 / (n1 + 2.0 * n2)
    d1 = 1.0 - 2.0 * y * n2 / n1
    d2 = 2.0 - 3.0 * y * n3 / n2 if n2 else KN_DISCOUNT
    d3 = 3.0 - 4.0 * y * n4 / n3 if n3 else KN_DISCOUNT
    return (min(max(d1, 0.0), 1.0), min(max(d2, 0.0), 2.0),
            min(max(d3, 0.0), 3.0))


def kneser_ney_score(df: DataFrame, text_col: str, id_col: str,
                     model: DataFrame,
                     discount: Union[float, str] = KN_DISCOUNT,
                     broadcast: Union[bool, str] = "auto",
                     ) -> DataFrame:
    """(id, kn_ppl, n_tokens) — per-document interpolated Kneser-Ney
    perplexity against a :func:`kneser_ney_model` table, entirely
    JVM-side.  ``id`` must identify documents uniquely (one output row
    per document).  ``discount`` is a fixed D in (0, 1) or ``"modified"``
    (per-order count-of-count discounts, the KenLM default).

    ``broadcast`` is the model-side JOIN POLICY: ``'auto'`` (default)
    broadcasts the six stat slices only while the materialized model is
    at most :data:`~.ngram_lm.LM_BROADCAST_MAX_ROWS` rows and falls back
    to plain hash joins on the gram keys beyond that — the full distinct-
    trigram table of a 100 TB corpus (10⁹⁺ rows) must never ride a
    forced broadcast hint (pair with ``kneser_ney_model(min_count=...)``
    pruning to stay under the threshold when broadcast speed matters).
    Empty documents yield ``kn_ppl = NULL`` with ``n_tokens = 0``."""
    from .ngram_lm import _lm_join_side

    # the model feeds six join branches; materialize once (ngram_lm
    # policy) so a raw training plan is not re-aggregated per branch.
    # The coalesce (narrow) folds the union's per-kind shuffle
    # partitions so the checkpoint scan, the auto probe and the six
    # broadcast builds each run cluster-parallelism tasks
    model = model.coalesce(
        df.sparkSession.sparkContext.defaultParallelism) \
        .localCheckpoint(eager=False)
    n_model = model.count() if broadcast == "auto" else 0
    side = lambda sdf: _lm_join_side(sdf, broadcast, n_model)  # noqa: E731
    c3 = model.filter(F.col("kind") == "c3").select(
        F.col("k1").alias("_3u"), F.col("k2").alias("_3v"),
        F.col("k3").alias("_3w"), F.col("v1").alias("_c3"))
    ctx3 = model.filter(F.col("kind") == "ctx3").select(
        F.col("k1").alias("_xu"), F.col("k2").alias("_xv"),
        F.col("v1").alias("_csum"), F.col("v2").alias("_n3"))
    n2 = model.filter(F.col("kind") == "n2").select(
        F.col("k1").alias("_2v"), F.col("k2").alias("_2w"),
        F.col("v1").alias("_n2"))
    ctx2 = model.filter(F.col("kind") == "ctx2").select(
        F.col("k1").alias("_yv"), F.col("v1").alias("_nsum"),
        F.col("v2").alias("_nn2"))
    n1 = model.filter(F.col("kind") == "n1").select(
        F.col("k1").alias("_1w"), F.col("v1").alias("_n1"))
    tot = model.filter(F.col("kind") == "tot").select(
        F.col("v1").alias("_tt"), F.col("v2").alias("_vv"))

    if discount == "modified":
        d3s = _modified_discounts(c3, "_c3")
        d2s = _modified_discounts(n2, "_n2")
        d1s = _modified_discounts(n1, "_n1")
    else:
        dfix = float(discount)
        if not 0.0 < dfix < 1.0:
            raise ValueError(f"discount must be in (0, 1), got {dfix}")
        d3s = d2s = d1s = (dfix, dfix, dfix)

    def disc(cnt: Column, ds: tuple) -> Column:
        """Per-count discount D(c): D₁, D₂ or D₃₊ (all equal for the
        fixed configuration, so this folds to a constant)."""
        if ds[0] == ds[1] == ds[2]:
            return F.lit(ds[0])
        return F.when(cnt == 1, F.lit(ds[0])) \
            .when(cnt == 2, F.lit(ds[1])).otherwise(F.lit(ds[2]))

    def removed(pre: str, ds: tuple) -> Column:
        """Total discount mass D₁·N₁ + D₂·N₂ + D₃₊·N₃₊ removed from a
        context, via its per-count type splits (columns {pre}1/2/3)."""
        return (F.lit(ds[0]) * F.col(f"{pre}1")
                + F.lit(ds[1]) * F.col(f"{pre}2")
                + F.lit(ds[2]) * F.col(f"{pre}3"))

    modified = discount == "modified"
    u1mass = None
    if modified:
        # unigram back-off mass is GLOBAL — the total discount removed
        # across all continuation types, Σ_w D(n₁(w)) = D₁·M₁ + D₂·M₂ +
        # D₃₊·M₃₊ (a per-row D(n₁(w_current)) would make the reserved
        # mass depend on the word being scored, breaking normalization);
        # three longs, driver-collected
        mrow = n1.agg(
            F.sum(F.when(F.col("_n1") == 1, 1).otherwise(0)).alias("m1"),
            F.sum(F.when(F.col("_n1") == 2, 1).otherwise(0)).alias("m2"),
            F.sum(F.when(F.col("_n1") >= 3, 1).otherwise(0)).alias("m3"),
        ).collect()[0]
        u1mass = (d1s[0] * (mrow["m1"] or 0) + d1s[1] * (mrow["m2"] or 0)
                  + d1s[2] * (mrow["m3"] or 0))
        # per-context count-of-count splits (N₁, N₂, N₃₊) — needed so
        # the back-off weight carries exactly the removed mass
        ctx3 = c3.groupBy("_3u", "_3v").agg(
            F.sum("_c3").alias("_csum"),
            F.sum(F.when(F.col("_c3") == 1, 1).otherwise(0)).alias("_m31"),
            F.sum(F.when(F.col("_c3") == 2, 1).otherwise(0)).alias("_m32"),
            F.sum(F.when(F.col("_c3") >= 3, 1).otherwise(0)).alias("_m33"),
        ).withColumnRenamed("_3u", "_xu").withColumnRenamed("_3v", "_xv")
        ctx2 = n2.groupBy("_2v").agg(
            F.sum("_n2").alias("_nsum"),
            F.sum(F.when(F.col("_n2") == 1, 1).otherwise(0)).alias("_m21"),
            F.sum(F.when(F.col("_n2") == 2, 1).otherwise(0)).alias("_m22"),
            F.sum(F.when(F.col("_n2") >= 3, 1).otherwise(0)).alias("_m23"),
        ).withColumnRenamed("_2v", "_yv")

    toks = _tokens(text_col)
    padded = F.concat(F.array(F.lit(None).cast("string"),
                              F.lit(None).cast("string")), toks)
    n = F.size(toks)
    zipped = F.arrays_zip(
        F.slice(padded, 1, F.greatest(n, F.lit(1))).alias("w2"),
        F.slice(padded, 2, F.greatest(n, F.lit(1))).alias("w1"),
        F.slice(padded, 3, F.greatest(n, F.lit(1))).alias("w"))
    # posexplode_outer keeps empty documents as one null-position row —
    # no second scan + join-back needed to restore them (guide §2.4)
    rows = (df.select(F.col(id_col).alias("id"),
                      F.posexplode_outer(F.when(n >= 1, zipped))
                      .alias("pos", "s"))
            .select("id", "pos",
                    F.col("s.w2").alias("_w2"), F.col("s.w1").alias("_w1"),
                    F.col("s.w").alias("_w")))
    joined = (
        rows
        .join(side(c3),
              (F.col("_w2").isNotNull()) & (F.col("_3u") == F.col("_w2"))
              & (F.col("_3v") == F.col("_w1"))
              & (F.col("_3w") == F.col("_w")), "left")
        .join(side(ctx3),
              (F.col("_w2").isNotNull()) & (F.col("_xu") == F.col("_w2"))
              & (F.col("_xv") == F.col("_w1")), "left")
        .join(side(n2),
              (F.col("_w1").isNotNull()) & (F.col("_2v") == F.col("_w1"))
              & (F.col("_2w") == F.col("_w")), "left")
        .join(side(ctx2),
              (F.col("_w1").isNotNull()) & (F.col("_yv") == F.col("_w1")),
              "left")
        .join(side(n1), F.col("_1w") == F.col("_w"), "left")
        .crossJoin(F.broadcast(tot)))

    # the interpolation ladder — the arithmetic tree below is mirrored
    # verbatim by the DuckDB oracle (queries._sql_kneser_ney); keep the
    # operation ORDER identical on both sides (IEEE doubles)
    tt = F.col("_tt").cast("double")
    vv = F.col("_vv").cast("double")
    cn1 = F.coalesce(F.col("_n1"), F.lit(0)).cast("double")
    u1m = F.lit(u1mass) if modified else F.lit(d1s[0]) * vv
    p1 = (F.greatest(cn1 - disc(F.col("_n1"), d1s), F.lit(0.0)) / tt
          + u1m / tt * (F.lit(1.0) / (vv + 1.0)))
    cn2 = F.coalesce(F.col("_n2"), F.lit(0)).cast("double")
    w2mass = removed("_m2", d2s) if modified \
        else F.lit(d2s[0]) * F.col("_nn2")
    p2 = F.when(
        F.col("_nsum").isNotNull(),
        F.greatest(cn2 - disc(F.col("_n2"), d2s), F.lit(0.0))
        / F.col("_nsum") + w2mass / F.col("_nsum") * p1).otherwise(p1)
    cc3 = F.coalesce(F.col("_c3"), F.lit(0)).cast("double")
    w3mass = removed("_m3", d3s) if modified \
        else F.lit(d3s[0]) * F.col("_n3")
    p3 = F.when(
        F.col("_csum").isNotNull(),
        F.greatest(cc3 - disc(F.col("_c3"), d3s), F.lit(0.0))
        / F.col("_csum") + w3mass / F.col("_csum") * p2).otherwise(p2)
    p = F.when(F.col("_w1").isNull(), p1) \
        .when(F.col("_w2").isNull(), p2).otherwise(p3)

    # the null-position row of an empty document contributes to neither
    # aggregate (count skips its NULL pos, the when() keeps it out of
    # the fold list), so 0-token docs come out 0.0/0 = NULL ppl —
    # exactly what the old ids-side join-back produced
    per_doc = (joined.select(
        "id", "pos",
        F.when(F.col("pos").isNotNull(), F.log(p)).alias("_lp"))
        .groupBy("id")
        .agg(F.count("pos").alias("n_tokens"),
             F.aggregate(
                 F.array_sort(F.collect_list(
                     F.when(F.col("pos").isNotNull(),
                            F.struct("pos", "_lp")))),
                 F.lit(0.0),
                 lambda acc, x: acc + x["_lp"]).alias("_sum")))
    # explicit 0-token guard (NULL ppl) — ANSI-safe where a bare 0/0
    # division would throw
    return per_doc.select(
        "id",
        F.when(F.col("n_tokens") > 0,
               F.exp(-F.col("_sum") / F.col("n_tokens").cast("double")))
        .alias("kn_ppl"),
        F.col("n_tokens"))
