"""Pipeline decision tests: golden gates, determinism, generator properties."""

import pytest
from pyspark.sql import functions as F

from discoverx_spark.pipeline import PipelineConfig, decide, run_pipeline
from discoverx_spark.transcripts import (generate_transcripts,
                                         generate_transcripts_pandas)
from discoverx_spark.functions.perplexity import perplexity_of, V
from discoverx_spark.scrub import scrub_string

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        ("c1", 0, "user", "Can you help me configure the cluster for the batch job?", None),
        ("c1", 1, "assistant", "", None),
        ("c1", 2, "user", "   \n ", None),
        ("c1", 3, "assistant", "ok", None),  # 1 token -> too_short
        ("c1", 4, "user", "you are so stupid, this is useless", None),
        ("c2", 0, "user", "Der Auftrag ist gestern ohne Fehler durchgelaufen und die Daten sind da.", None),
        ("c2", 1, "assistant", "my email is jane.doe+test@example-corp.com and the plan looks good to me", None),
        ("c2", 2, "user", "the zzkq xjw the qqqzv the kkj zzz qqq xxj", None),  # junk -> high ppl
    ]
    return spark.createDataFrame(
        [(c, t, r, x, tool, None) for (c, t, r, x, tool) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")


@pytest.fixture(scope="module")
def decisions(turns):
    return {(r["conv_id"], r["turn_idx"]): r for r in decide(turns, CFG).collect()}


def test_decision_schema(turns):
    cols = decide(turns, CFG).columns
    assert cols == ["conv_id", "turn_idx", "role", "lang", "lang_score",
                    "perplexity", "pii_counts", "toxicity_score", "keep",
                    "drop_reasons", "scrubbed_text"]


def test_keep_good_english(decisions):
    r = decisions[("c1", 0)]
    assert r["keep"] and r["drop_reasons"] == [] and r["lang"] == "en"


def test_empty_and_blank_dropped(decisions):
    assert decisions[("c1", 1)]["drop_reasons"] == ["empty"]
    assert decisions[("c1", 2)]["drop_reasons"] == ["empty"]


def test_too_short(decisions):
    assert "too_short" in decisions[("c1", 3)]["drop_reasons"]


def test_toxicity(decisions):
    r = decisions[("c1", 4)]
    assert "toxicity" in r["drop_reasons"]
    assert r["toxicity_score"] > 0


def test_non_target_lang(decisions):
    r = decisions[("c2", 0)]
    assert r["lang"] == "de"
    assert "non_target_lang" in r["drop_reasons"]


def test_pii_scrubbed_but_kept(decisions):
    r = decisions[("c2", 1)]
    assert r["keep"]
    assert r["pii_counts"]["email"] == 1
    assert "[REDACTED_EMAIL]" in r["scrubbed_text"]
    assert "jane.doe" not in r["scrubbed_text"]
    # byte-exact vs the driver-side scrubber
    assert r["scrubbed_text"] == scrub_string(
        "my email is jane.doe+test@example-corp.com and the plan looks good to me")[0]


def test_high_perplexity_junk(decisions):
    r = decisions[("c2", 2)]
    assert "high_perplexity" in r["drop_reasons"]
    assert r["perplexity"] > CFG.max_perplexity


def test_perplexity_sanity():
    good = perplexity_of("the team agreed that the pipeline should keep the text")
    junk = perplexity_of("zzkq xjw qqqzv kkj zzz qqq xxj")
    assert good < 10 < junk
    assert perplexity_of("") == float(V)
    assert perplexity_of(None) == float(V)


def test_run_pipeline_filters(turns):
    out = run_pipeline(turns, CFG)
    keys = {(r["conv_id"], r["turn_idx"]) for r in out.collect()}
    assert ("c1", 0) in keys and ("c2", 1) in keys
    assert ("c1", 1) not in keys and ("c2", 2) not in keys


# ---------------------------------------------------------------------------
# Generator determinism + pipeline reproducibility
# ---------------------------------------------------------------------------

def test_generator_deterministic(spark):
    a = generate_transcripts(spark, 30, seed=7).collect()
    b = generate_transcripts(spark, 30, seed=7, num_partitions=5).collect()
    key = lambda r: (r["conv_id"], r["turn_idx"])
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[1])) == \
           sorted(map(tuple, b), key=lambda t: (t[0], t[1]))
    # matches the driver-local generator
    pdf = generate_transcripts_pandas(30, seed=7)
    assert len(pdf) == len(a)


def test_generator_shape_and_skew(spark):
    df = generate_transcripts(spark, 200, seed=42, hot_frac=0.05)
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    counts = df.groupBy("conv_id").count()
    mx = counts.agg(F.max("count")).first()[0]
    med = counts.approxQuantile("count", [0.5], 0.01)[0]
    assert mx > 5 * med  # hot conversations exist
    # turn_idx contiguous per conv
    chk = df.groupBy("conv_id").agg(
        F.count("*").alias("n"), (F.max("turn_idx") + 1).alias("m"))
    assert chk.filter(F.col("n") != F.col("m")).count() == 0


def test_pipeline_deterministic_across_runs(spark):
    df = generate_transcripts(spark, 50, seed=9)
    d1 = decide(df, CFG).orderBy("conv_id", "turn_idx").collect()
    d2 = decide(generate_transcripts(spark, 50, seed=9, num_partitions=3),
                CFG).orderBy("conv_id", "turn_idx").collect()
    for a, b in zip(d1, d2):
        assert a["scrubbed_text"] == b["scrubbed_text"]
        assert a["keep"] == b["keep"]
        assert a["drop_reasons"] == b["drop_reasons"]


def test_memoized_decide_byte_identical(spark):
    """PipelineConfig.memo_size caches pure-function results per worker —
    output must be byte-identical to the unmemoized path on an input with
    heavy exact repetition."""
    turns = generate_transcripts(spark, 80, seed=7)
    plain = sorted(map(tuple, decide(turns, PipelineConfig()).collect()))
    memo = sorted(map(tuple,
                      decide(turns, PipelineConfig(memo_size=1 << 14))
                      .collect()))
    assert plain == memo
