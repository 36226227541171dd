"""The quality-filter pipeline: per-turn keep/drop decisions + scrubbed text.

This is the north-rule re-expression of the reference's scan→classify→act
lifecycle (``/root/reference/discoverx/scanner.py`` +
``msql.py`` select/delete-by-class) for one huge transcripts table:

    read transcripts
      → language ID                 (JVM expr profile or Arrow UDF)
      → perplexity                  (Arrow UDF, numpy-vectorized)
      → PII scrub + counts          (Arrow UDF, compiled alternation)
      → toxicity + quality gates    (F.when chains, shape per reference
                                     delta_housekeeping.py:251-363)
      → keep/drop + drop_reasons    (array_compact of conditional flags)
      → stable (conv_id, turn_idx) ordering on write

Output schema = FIXTURES.md §F2 ``decisions`` table.  Everything except the
three Arrow UDFs is whole-stage-codegen JVM work; the UDFs are batched and
stateless-per-batch, so the plan is a single narrow map stage over the
input — zero shuffles until the optional write-time ordering.  Decision
logic contains no timestamps or nondeterminism (resume-safety invariant,
SURVEY §7 hard part 5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.perplexity import make_perplexity_udf
from .functions.text import (char_len_expr, langid_struct_expr,
                             make_langid_udf, token_count_expr,
                             toxicity_exprs, whitespace_only_expr)
from .scrub import PROFILE_PYTHON, make_scrub_udf

DECISION_COLUMNS = [
    "conv_id", "turn_idx", "role", "lang", "lang_score", "perplexity",
    "pii_counts", "toxicity_score", "keep", "drop_reasons", "scrubbed_text",
]


@dataclass(frozen=True)
class PipelineConfig:
    """Gate thresholds. All decisions are pure functions of the row."""

    min_tokens: int = 2
    max_chars: int = 20000
    allowed_langs: Tuple[str, ...] = ("en",)
    max_perplexity: float = 16.0
    max_toxicity_hits: int = 1          # drop when hits >= this
    toxicity_keywords: Optional[Tuple[str, ...]] = None
    scrub_profile: str = PROFILE_PYTHON
    langid_mode: str = "expr"           # "expr" (JVM) | "udf" (Arrow, +scripts)


def annotate(df: DataFrame, cfg: PipelineConfig = PipelineConfig()) -> DataFrame:
    """Attach feature columns; no filtering. One narrow map stage."""
    scrub = make_scrub_udf(cfg.scrub_profile)
    ppl = make_perplexity_udf()
    tox_hits, tox_score = toxicity_exprs("text", cfg.toxicity_keywords)
    lid = (make_langid_udf()(F.col("text")) if cfg.langid_mode == "udf"
           else langid_struct_expr("text"))
    return (
        df
        .withColumn("_lid", lid)
        .withColumn("_scrub", scrub(F.col("text")))
        .withColumn("perplexity", ppl(F.col("text")))
        .withColumn("_tox_hits", tox_hits)
        .withColumn("toxicity_score", tox_score)
        .withColumn("_n_tokens", token_count_expr("text"))
        .withColumn("_n_chars", char_len_expr("text"))
        .withColumn("_is_blank", F.col("text").isNull() | whitespace_only_expr("text"))
    )


def _drop_reasons(cfg: PipelineConfig) -> Column:
    flag = lambda cond, name: F.when(cond, F.lit(name))
    lang_ok = F.col("_lid.lang").isin(*cfg.allowed_langs)
    # substantive = long enough to judge language/fluency at all
    substantive = ~F.col("_is_blank") & (F.col("_n_tokens") >= cfg.min_tokens)
    return F.array_compact(F.array(
        flag(F.col("_is_blank"), "empty"),
        flag(~F.col("_is_blank") & (F.col("_n_tokens") < cfg.min_tokens), "too_short"),
        flag(F.col("_n_chars") > cfg.max_chars, "too_long"),
        flag(substantive & ~lang_ok, "non_target_lang"),
        flag(substantive & lang_ok
             & (F.col("perplexity") > cfg.max_perplexity), "high_perplexity"),
        flag(F.col("_tox_hits") >= cfg.max_toxicity_hits, "toxicity"),
    ))


def decide(df: DataFrame, cfg: PipelineConfig = PipelineConfig()) -> DataFrame:
    """Per-turn decision table (FIXTURES.md §F2). Input shape:
    (conv_id, turn_idx, role, text, tool, ts)."""
    return (
        annotate(df, cfg)
        .withColumn("drop_reasons", _drop_reasons(cfg))
        .select(
            "conv_id", "turn_idx", "role",
            F.col("_lid.lang").alias("lang"),
            F.col("_lid.lang_score").alias("lang_score"),
            "perplexity",
            F.col("_scrub.pii_counts").alias("pii_counts"),
            "toxicity_score",
            (F.size("drop_reasons") == 0).alias("keep"),
            "drop_reasons",
            F.col("_scrub.scrubbed_text").alias("scrubbed_text"),
        )
    )


def write_decisions(decisions: DataFrame, path: str,
                    partition_col: Optional[str] = None,
                    mode: str = "overwrite") -> None:
    """Write under the stable ordering invariant: rows sorted within each
    file by (conv_id, turn_idx) (SURVEY §2.6)."""
    out = decisions.sortWithinPartitions("conv_id", "turn_idx")
    writer = out.write.mode(mode)
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(path)


def run_pipeline(df: DataFrame, cfg: PipelineConfig = PipelineConfig()) -> DataFrame:
    """decide() + the turns that survive, scrubbed — the "flagship query"."""
    d = decide(df, cfg)
    return d.filter(F.col("keep")).select(
        "conv_id", "turn_idx", "role", "lang", "scrubbed_text")
