"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-deterministic only for a FIXED physical
partitioning: a resume, a repartition, or a different cluster size yields a
different sample — unacceptable for the resumable 10^12-turn pipeline
(SURVEY §7 determinism invariant).  These operators key the keep/drop
decision on a HASH OF THE ROW KEY instead, so the sample is a pure
projection + filter: partitioning-invariant, resume-safe, pushdown-friendly
(the filter sits directly on the scan), and reproducible in ANSI SQL for
the oracle (md5 family; production uses xxhash64, same shape).

Reference tie-in: the reference samples with ``TABLESAMPLE (N ROWS)``
(scanner.py:338) — read-order biased; this is the scale-correct
replacement (same role as classify_scores' ``sample_fraction``).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bucket space for the keep threshold; 2^20 gives fraction granularity
# ~1e-6 while staying far under the 2^32 entropy of the md5-derived hash
BUCKETS = 1 << 20


def _bucket_expr(key, hash_mode: str = "xxhash64",
                 buckets: int = BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from the row key (key is cast to
    string first so both hash families and the SQL oracle agree on the
    hashed bytes).  The canonical dual-family bucket hash — dsir reuses
    it with its own bucket count."""
    c = key if isinstance(key, Column) else F.col(key)
    s = c.cast("string")
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(s), F.lit(buckets))
    if hash_mode == "md5":
        h = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        return F.pmod(h, F.lit(buckets))
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                hash_mode: str = "xxhash64") -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction`` of bucket
    space — a deterministic Bernoulli-style sample, invariant to
    partitioning/read order/cluster size."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(
        _bucket_expr(key_col, hash_mode) < int(round(fraction * BUCKETS)))


def stratified_hash_sample(df: DataFrame, key_col: str, strata_col: str,
                           fractions: Dict[str, float],
                           default_fraction: float = 0.0,
                           hash_mode: str = "xxhash64") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing for a
    training mix: keep 10% of English, 100% of low-resource languages).
    The per-row threshold is a small when-chain over stratum literals —
    whole-stage codegen, no join, no shuffle."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0,1]")
    thr: Column = F.lit(int(round(default_fraction * BUCKETS)))
    for s, f in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == s,
                     F.lit(int(round(f * BUCKETS)))).otherwise(thr)
    return df.filter(_bucket_expr(key_col, hash_mode) < thr)


def cap_per_group(df: DataFrame, group_col: str, order_col: str, n: int,
                  tiebreak_col: Optional[str] = None,
                  descending: bool = True) -> DataFrame:
    """Keep at most ``n`` rows per group, best-first — the per-domain /
    per-source quota cap of C4/RefinedWeb-style training mixes ("no single
    host dominates the corpus").  Deterministic: ordering is
    (order_col [desc], tiebreak_col asc), so ties never depend on
    partitioning.  One exchange on the group key; AQE's skew handling
    covers hot groups (a mega-domain is exactly the skewed-key case)."""
    from pyspark.sql.window import Window

    if n <= 0:
        raise ValueError("n must be positive")
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def split_train_holdout(df: DataFrame, key_col: str, holdout_fraction: float,
                        hash_mode: str = "xxhash64") -> tuple:
    """(train, holdout) disjoint deterministic split on the same hash —
    the two sides partition the bucket space, so no row appears in both
    regardless of when or where each side is computed."""
    cut = int(round(holdout_fraction * BUCKETS))
    b = _bucket_expr(key_col, hash_mode)
    return df.filter(b >= cut), df.filter(b < cut)


def domain_blocklist_filter(df: DataFrame, text_col: str, id_col: str,
                            blocklist: DataFrame,
                            domain_col: str = "domain") -> DataFrame:
    """Drop rows containing a URL whose host — or ANY parent domain of it
    — appears in the blocklist (UT1-style domain filtering).

    Suffix matching is done by EXPLODING each host into its domain
    suffixes (``a.b.c.com`` → ``a.b.c.com``, ``b.c.com``, ``c.com``;
    single-label suffixes like bare TLDs are excluded) and semi-joining
    against the blocklist — so a blocklist entry blocks every subdomain
    without per-row iteration over the list.  The blocklist side is
    broadcast (UT1-class lists are a few MB); the corpus text never
    shuffles — only ``(id, suffix)`` short rows feed the semi-join, and
    the final drop is a left-anti join on ``id_col`` (the small bad-id
    set broadcasts in turn under AQE).
    """
    # (?i) scheme, optional userinfo ('https://x@badsite.org' must still
    # yield badsite.org), and trailing dots stripped ('badsite.org.' is
    # the same host) — a FILTER is judged by the evasions it closes
    hosts = df.select(
        F.col(id_col), F.explode(F.regexp_extract_all(
            F.col(text_col),
            F.lit(r"(?i)https?://(?:[^/\s@]*@)?([A-Za-z0-9.-]+)"), 1))
        .alias("_bl_raw"))
    host = F.regexp_replace(F.lower(F.col("_bl_raw")), r"\.+$", "")
    # materialize the split as a column: an inline expression referenced
    # from the transform lambda is re-evaluated per element by Catalyst
    staged = hosts.select(id_col, F.split(host, r"\.").alias("_bl_parts"))
    parts = F.col("_bl_parts")
    sufs = F.transform(
        parts,
        lambda x, i: F.array_join(
            F.slice(parts, i + 1, F.size(parts)), "."))
    bad = (staged.select(id_col, F.explode(sufs).alias("_bl_suf"))
           .where(F.col("_bl_suf").contains("."))
           .join(F.broadcast(blocklist.select(
               F.lower(F.col(domain_col)).alias("_bl_suf"))), "_bl_suf",
               "left_semi")
           .select(id_col).distinct())
    return df.join(bad, on=id_col, how="left_anti")


def mixing_rates(df: DataFrame, group_col: str,
                 target_shares: Dict[str, float],
                 weight: Optional[Column] = None) -> DataFrame:
    """Per-domain sampling rates that realize a target training mix
    WITHOUT upsampling (the solver that feeds
    :func:`stratified_hash_sample`: DoReMi/Pile-style domain weights in,
    keep-fractions out).

    Feasible budget ``T = min_d(units_d / share_d)`` — the binding domain
    samples at rate 1.0, every other domain at
    ``share_d * T / units_d < 1``, so the sampled corpus matches the
    target proportions exactly at the largest size that needs no
    duplication.  ``weight`` defaults to row count; pass
    ``token_count_expr(text)`` to mix by tokens.

    Scale shape: one groupBy of (domain, weight) partial sums; the target
    table and the 1-row feasible-budget aggregate are both broadcast.
    Domains absent from ``target_shares`` are excluded (rate 0 by
    omission).  Returns
    ``(group, n_units, target_share, rate, sampled_units)``.
    """
    w = weight if weight is not None else F.lit(1)
    total = float(sum(target_shares.values()))
    tgt = df.sparkSession.createDataFrame(
        [(k, v / total) for k, v in sorted(target_shares.items())],
        f"{group_col} string, target_share double")
    stats = (df.groupBy(group_col)
             .agg(F.sum(w).cast("long").alias("n_units")))
    j = stats.join(F.broadcast(tgt), group_col, "inner")
    # global feasible budget via an empty-partition window: the frame is
    # domain-count-sized, so one single-partition window beats deriving
    # the whole aggregate subplan twice (crossJoin of a 1-row agg would
    # re-run the groupBy per reference)
    from pyspark.sql.window import Window
    t = F.min(F.col("n_units") / F.col("target_share")) \
        .over(Window.partitionBy())
    return (j.select(group_col, "n_units", "target_share",
                     F.round(F.col("target_share") * t
                             / F.col("n_units"), 6).alias("rate"),
                     F.round(F.col("target_share") * t, 6)
                     .alias("sampled_units")))


def temperature_mix(df: DataFrame, group_col: str, temperature: float,
                    weight: Optional[Column] = None) -> DataFrame:
    """Temperature-scaled sampling shares: ``p_d ∝ n_d^(1/τ)`` — the
    mT5 / XLM-R multilingual mixing scheme (Xue et al. 2021 §3.2;
    Conneau et al. 2020 §3), where τ > 1 upsamples the tail domains and
    τ = 1 recovers proportional-to-size sampling.  Unlike
    :func:`mixing_rates` (explicit target shares in), here the targets
    are DERIVED from the observed sizes.

    Returns ``(group, n_units, raw_share, temp_share, boost)`` with
    ``boost = temp_share / raw_share`` (the up/down-sampling factor a
    sampler must realize).  Feed the resulting shares to
    :func:`mixing_rates` to get feasible keep-rates.

    Scale shape: one groupBy of partial sums (domain-count-sized
    output) + one single-partition window over that tiny frame."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    w = weight if weight is not None else F.lit(1)
    stats = (df.groupBy(group_col)
             .agg(F.sum(w).cast("long").alias("n_units")))
    from pyspark.sql.window import Window
    win = Window.partitionBy()
    tot = F.sum("n_units").over(win)
    p = F.pow(F.col("n_units").cast("double"), F.lit(1.0 / temperature))
    tot_p = F.sum(p).over(win)
    raw = F.col("n_units") / tot
    temp = p / tot_p
    return stats.select(group_col, "n_units",
                        F.round(raw, 6).alias("raw_share"),
                        F.round(temp, 6).alias("temp_share"),
                        F.round(temp / raw, 6).alias("boost"))


def token_budget_select(df: DataFrame, id_col: str, score: Column,
                        cost: Column, budget: int) -> DataFrame:
    """Budget-constrained greedy selection: rank units by ``score``
    (descending, ties by id) and keep the maximal prefix whose
    cumulative ``cost`` stays within ``budget`` — "fill the token budget
    with the best-scoring documents", the selection step after any
    quality scorer / DSIR weighting.

    The global prefix-sum is computed DISTRIBUTED, not with a
    single-partition window: range-repartition by the ranking key, local
    cumulative sums per partition, then a partition-count-sized offset
    table (one tiny window) broadcast-joined back.  The ranking key is
    total (score, id), so the kept set is deterministic even though
    range boundaries are sampled.  Cost: one range shuffle + one hash
    shuffle on partition id; no driver materialization.

    Returns ``(id, score, cost, cum_cost)`` for the selected prefix.
    """
    from pyspark.sql.window import Window
    base = df.select(F.col(id_col).alias("id"), score.alias("score"),
                     cost.cast("long").alias("cost"))
    # lazy checkpoint: `ranked` feeds BOTH the per-partition cumsum and
    # the totals aggregate — without the lineage cut each reference
    # re-derives the range shuffle (the curation_pipeline_v2 lesson)
    ranked = (base.repartitionByRange(F.col("score").desc(),
                                      F.col("id").asc())
              .sortWithinPartitions(F.col("score").desc(),
                                    F.col("id").asc())
              .withColumn("_part", F.spark_partition_id())
              .localCheckpoint(eager=False))
    wloc = (Window.partitionBy("_part")
            .orderBy(F.col("score").desc(), F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = ranked.withColumn("_cum_local", F.sum("cost").over(wloc))
    totals = ranked.groupBy("_part").agg(F.sum("cost").alias("_tot"))
    woff = (Window.orderBy("_part")
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_part", F.coalesce(F.sum("_tot").over(woff),
                            F.lit(0)).alias("_off"))
    out = (local.join(F.broadcast(offsets), "_part")
           .withColumn("cum_cost", F.col("_cum_local") + F.col("_off"))
           .filter(F.col("cum_cost") <= budget)
           .select("id", "score", "cost", "cum_cost"))
    return out


def shard_assign(df: DataFrame, id_col: str, n_shards: int,
                 hash_mode: str = "xxhash64") -> DataFrame:
    """Deterministic training-shard assignment: ``shard =
    hash(id) mod n_shards`` — a pure projection (NO global sort, NO
    window), so it is the only shard scheme that survives 100 TB: each
    writer task needs nothing but the row it holds, and balance follows
    from the hash (expected deviation ~ sqrt(docs/shard)).

    An exact token-balanced assignment (bin packing) needs a global
    greedy pass that cannot be expressed without serializing on one
    partition; at scale the hash scheme + per-shard stats audit is the
    standard practice.  Returns the input plus a ``shard`` column."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from .dedup import _hash_fn
    h = _hash_fn(hash_mode, 0)(F.col(id_col).cast("string"))
    return df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int"))


def doremi_step(df: DataFrame, group_col: str, loss: Column,
                ref_loss: Column, weights: Dict[str, float],
                eta: float = 1.0, smoothing: float = 0.0) -> DataFrame:
    """One DoReMi domain-reweighting step (Xie et al. 2023, alg. 1
    inner update): per-domain average excess loss
    ``λ_d = mean(max(loss − ref_loss, 0))`` drives a multiplicative
    update ``w'_d ∝ w_d · exp(η·λ_d)``, optionally mixed with the
    uniform distribution by ``smoothing`` (the paper's c).

    Scale shape: one groupBy of (domain, excess) partial means; the
    prior-weight table is broadcast and the normalizer is one
    single-partition window over the domain-count-sized frame.  Returns
    ``(group, n_units, excess_loss, weight)`` rounded to 6 dp."""
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0,1], got {smoothing}")
    from pyspark.sql.window import Window
    total = float(sum(weights.values()))
    prior = df.sparkSession.createDataFrame(
        [(k, v / total) for k, v in sorted(weights.items())],
        f"{group_col} string, _prior double")
    stats = (df.groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("n_units"),
                  F.avg(F.greatest(loss - ref_loss, F.lit(0.0)))
                  .alias("excess_loss")))
    # the prior's domain universe is authoritative: a domain with no
    # rows this step keeps its (smoothed) prior mass via excess 0 — an
    # inner join would silently drop it and renormalize over a DIFFERENT
    # universe than the caller's prior.  Data domains absent from the
    # prior are excluded (weight 0 by omission, as in mixing_rates).
    j = (prior.join(F.broadcast(stats), group_col, "left")
         .select(group_col,
                 F.coalesce(F.col("n_units"), F.lit(0).cast("long"))
                 .alias("n_units"),
                 F.coalesce(F.col("excess_loss"), F.lit(0.0))
                 .alias("excess_loss"),
                 "_prior"))
    unnorm = F.col("_prior") * F.exp(F.lit(eta) * F.col("excess_loss"))
    win = Window.partitionBy()
    k = F.count(F.lit(1)).over(win)
    norm = unnorm / F.sum(unnorm).over(win)
    mixed = (1.0 - smoothing) * norm + F.lit(smoothing) / k
    return j.select(group_col, "n_units",
                    F.round("excess_loss", 6).alias("excess_loss"),
                    F.round(mixed, 6).alias("weight"))
