"""Classifier-evaluation operators — the measurement half of a quality
filter.

The north-star gate for a rebuilt keep/drop pipeline is agreement with the
reference's labels (F1 >= 0.99), so the evaluation itself must be a
first-class distributed operator, not a driver-side sklearn call:

- :func:`binary_classification_report` — one-row confusion matrix +
  accuracy/precision/recall/F1.  A single aggregate with conditional
  sums: map-side partial aggregation, one SinglePartition exchange of
  four longs, no matter the corpus size.
- :func:`binary_auc` — exact Mann-Whitney (rank-sum) ROC AUC with
  average-rank tie handling, computed on the DISTINCT-SCORE frame:
  ``AUC = (Σ_s pos_s·cum_neg_below(s) + ½·Σ_s pos_s·neg_s) / (P·N)``.
  One vocabulary-of-scores-bounded groupBy, then a running-sum window
  over the distinct scores.  That window is unpartitioned by design —
  quantized scores (the repo's classifiers emit round(p, 6)) bound it at
  <= 10^6 + 1 rows of three longs regardless of corpus size; feeding
  unquantized raw doubles degenerates it to corpus-sized, so round first.
- :func:`calibration_bins` — reliability-diagram bins (n, mean predicted
  probability, observed positive rate): one groupBy with ``n_bins``
  output rows.
- :func:`normalize_scores` — per-group percent_rank calibration, the
  CCNet-style "compare scores within a language/domain, not globally"
  step.  Per-group windows partition cleanly; project to
  (id, group, score) before calling so the window shuffle carries no
  payload text.

Reference parity note: the reference scores columns/rows and filters on
score (scanner.py:57-68 score threshold); this module adds the evaluation
surface a reference user needs when validating such filters against
labels — there is no reference counterpart file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def binary_classification_report(df: DataFrame, label_col,
                                 pred_col) -> DataFrame:
    """One-row (tp, fp, fn, tn, accuracy, precision, recall, f1).

    ``label_col`` / ``pred_col`` are boolean-valued columns or names.
    Empty-denominator conventions: precision with no positive
    predictions, recall with no positive labels, and F1 with both zero
    are reported as 0.0 (never NULL/NaN), so downstream gates compare
    cleanly.  Metrics are rounded to 6 dp to match the registry's
    hash-stable convention."""
    y = _as_col(label_col).cast("boolean")
    p = _as_col(pred_col).cast("boolean")

    def n(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = df.agg(n(y & p).alias("tp"), n(~y & p).alias("fp"),
                 n(y & ~p).alias("fn"), n(~y & ~p).alias("tn"))
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")

    def ratio(num, den):
        return F.round(F.when(den > 0, num.cast("double") / den)
                       .otherwise(F.lit(0.0)), 6)

    return agg.select(
        "tp", "fp", "fn", "tn",
        ratio(tp + tn, tp + fp + fn + tn).alias("accuracy"),
        ratio(tp, tp + fp).alias("precision"),
        ratio(tp, tp + fn).alias("recall"),
        ratio(2 * tp, 2 * tp + fp + fn).alias("f1"))


def binary_auc(df: DataFrame, label_col, score_col) -> DataFrame:
    """One-row exact ROC AUC (Mann-Whitney with average-rank ties):
    (n_pos, n_neg, auc).  ``auc`` is NULL when either class is absent
    (undefined, surfaced rather than faked).  See the module docstring
    for the distinct-score scale argument — quantize scores first."""
    y = _as_col(label_col).cast("boolean")
    s = _as_col(score_col).cast("double")
    # NULL-scored rows are EXCLUDED up front (the standard AUC
    # convention) — previously they grouped into their own bucket and,
    # sorting first in the rank window, silently counted as the
    # lowest-ranked scores (a NULL-scored positive deflated the AUC;
    # ADVICE r5)
    per_score = (df.select(s.alias("score"), y.alias("y"))
                 .filter(F.col("score").isNotNull())
                 .groupBy("score")
                 .agg(F.sum(F.when(F.col("y"), 1).otherwise(0))
                      .cast("long").alias("pos"),
                      F.sum(F.when(F.col("y"), 0).otherwise(1))
                      .cast("long").alias("neg")))
    win = (Window.partitionBy().orderBy("score")
           .rowsBetween(Window.unboundedPreceding, -1))
    cum_neg_below = F.coalesce(F.sum("neg").over(win), F.lit(0))
    stats = (per_score
             .select("pos", "neg", cum_neg_below.alias("neg_below"))
             .agg(F.sum("pos").cast("long").alias("n_pos"),
                  F.sum("neg").cast("long").alias("n_neg"),
                  F.sum(F.col("pos") * F.col("neg_below")).cast("double")
                  .alias("_conc"),
                  F.sum(F.col("pos") * F.col("neg")).cast("double")
                  .alias("_ties")))
    np_, nn = F.col("n_pos"), F.col("n_neg")
    auc = F.when((np_ > 0) & (nn > 0),
                 F.round((F.col("_conc") + 0.5 * F.col("_ties"))
                         / (np_ * nn).cast("double"), 6))
    return stats.select("n_pos", "n_neg", auc.alias("auc"))


def calibration_bins(df: DataFrame, label_col, score_col,
                     n_bins: int = 10) -> DataFrame:
    """Reliability-diagram bins over scores in [0, 1]:
    (bin, n, mean_score, frac_pos), bin = min(floor(score·n_bins),
    n_bins−1) so score = 1.0 lands in the top bin.  Only non-empty bins
    are returned (output <= n_bins rows)."""
    if n_bins <= 0:
        raise ValueError(f"n_bins must be > 0, got {n_bins}")
    y = _as_col(label_col).cast("boolean")
    s = _as_col(score_col).cast("double")
    b = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    return (df.select(b.alias("bin"), s.alias("score"), y.alias("y"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("score"), 6).alias("mean_score"),
                 F.round(F.avg(F.when(F.col("y"), 1.0).otherwise(0.0)), 6)
                 .alias("frac_pos")))


def topk_recall(approx: DataFrame, exact: DataFrame,
                query_col: str, id_col: str) -> DataFrame:
    """Per-query recall of an approximate top-k result against the exact
    one: (query, n_exact, n_hit, recall).  Queries present in ``exact``
    but entirely missed by ``approx`` surface with recall 0.0 (left
    join), so a bucketing bug can't hide by dropping queries.

    Both inputs are (query, id) frames — pre-filter to rank <= k before
    calling if the frames carry deeper results.  Scale shape: one
    (query, id)-keyed semi-join + two query-keyed aggregates; only key
    pairs shuffle, and the output is queries-sized."""
    e = exact.select(F.col(query_col).alias("query"),
                     F.col(id_col).alias("id"))
    a = approx.select(F.col(query_col).alias("query"),
                      F.col(id_col).alias("id"))
    n_exact = e.groupBy("query").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    hits = (e.join(a, ["query", "id"], "left_semi")
            .groupBy("query")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hit")))
    return (n_exact.join(hits, "query", "left")
            .select("query", "n_exact",
                    F.coalesce("n_hit", F.lit(0)).alias("n_hit"))
            .withColumn("recall", F.round(
                F.col("n_hit") / F.col("n_exact").cast("double"), 6)))


def normalize_scores(df: DataFrame, group_col, score_col,
                     id_col: str) -> DataFrame:
    """Per-group score calibration: (id, group, score, score_pct) where
    ``score_pct = percent_rank()`` within the group ordered by score —
    tied scores share a rank, so the output is deterministic under any
    partitioning with no tiebreak column.  This is the CCNet move of
    ranking perplexities within a language rather than globally, so a
    single global threshold acts fairly across domains.

    Shuffles one row of (id, group, score) per document — pass a
    projected frame, not one carrying payload text."""
    g = _as_col(group_col)
    s = _as_col(score_col).cast("double")
    base = df.select(F.col(id_col).alias("id"), g.alias("group"),
                     s.alias("score"))
    win = Window.partitionBy("group").orderBy("score")
    return base.withColumn(
        "score_pct", F.round(F.percent_rank().over(win), 6))
