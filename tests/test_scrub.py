"""Scrub determinism + profile parity tests."""

import duckdb
import pytest

from discoverx_spark.scrub import (PROFILE_PYTHON, PROFILE_SQL, SCRUB_RULES,
                                   scrub_string, scrub_sql_exprs,
                                   scrub_text_expr, make_scrub_udf)

EXACT_CASES = [
    ("contact me at me+mysomething@mydomain.com today",
     "contact me at [REDACTED_EMAIL] today", {"email": 1}),
    ("ip was 192.168.1.12, retry", "ip was [REDACTED_IP], retry", {"ip_v4": 1}),
    ("version 1.2.3.4.5 unchanged", "version 1.2.3.4.5 unchanged", {}),
    ("card 1234-5678-9012-3456 expired",
     "card [REDACTED_CC] expired", {"credit_card_number": 1}),
    ("not a card 1234-5678-9012-3456-7890 ok",
     "not a card 1234-5678-9012-3456-7890 ok", {}),
    ("ssn 123-45-6789.", "ssn [REDACTED_SSN].", {"us_social_security_number": 1}),
    ("call +1 (123) 456-7890 now", "call [REDACTED_PHONE] now", {"us_phone_number": 1}),
    ("call 123-456-7890 now", "call [REDACTED_PHONE] now", {"us_phone_number": 1}),
    ("see https://sub.domain-name.com:8080/x?a=1 for docs",
     "see [REDACTED_URL] for docs", {"url": 1}),
    ("addr 2001:db8:3333:4444:5555:6666:7777:8888 pinged",
     "addr [REDACTED_IP] pinged", {"ip_v6": 1}),
    ("time 12:34:56 is not an ip", "time 12:34:56 is not an ip", {}),
    ("a@b.c is not email, me@.my.com neither",
     "a@b.c is not email, me@.my.com neither", {}),
    ("two ips 1.2.3.4 5.6.7.8!", "two ips [REDACTED_IP] [REDACTED_IP]!", {"ip_v4": 2}),
    (None, None, {}),
    ("", "", {}),
]


@pytest.mark.parametrize("text,expected,counts", EXACT_CASES,
                         ids=[str(i) for i in range(len(EXACT_CASES))])
def test_scrub_python_profile(text, expected, counts):
    scrubbed, got_counts = scrub_string(text, PROFILE_PYTHON)
    assert scrubbed == expected
    assert dict(got_counts) == counts


def test_scrub_deterministic_repeat():
    text = "mail x@y.com ip 10.0.0.1 cc 1111-2222-3333-4444 ssn 123-45-6789"
    out1 = scrub_string(text)
    out2 = scrub_string(text)
    assert out1 == out2
    # idempotent: scrubbing scrubbed text changes nothing
    assert scrub_string(out1[0])[0] == out1[0]


def test_precedence_credit_card_before_phone():
    # the 10 digits inside a credit card must not be re-matched as a phone
    s, c = scrub_string("cc 1234-5678-9012-3456 done")
    assert s == "cc [REDACTED_CC] done"
    assert "us_phone_number" not in c


SQL_PARITY_TEXTS = [
    "email a.b@c-d.org here",
    "ips 1.2.3.4 and 255.255.255.255 and 999.1.1.1",
    "card 1234-5678-9012-3456 ssn 123-45-6789 phone 123-456-7890",
    "url http://www.domain.com/a_b?x=1 trailing",
    "plain text with no pii at all",
    "addr fe80:1:2:3:4:5:6:7 ok",
]


def test_sql_profile_matches_duckdb(spark):
    """Spark JVM regexp_replace chain == DuckDB regexp_replace chain ==
    Python re on the RE2-safe profile (oracle parity guarantee)."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(t,) for t in SQL_PARITY_TEXTS], "text string")
    spark_out = [r[0] for r in
                 sdf.select(scrub_text_expr("text").alias("s")).collect()]

    con = duckdb.connect()
    expr = scrub_sql_exprs("text")
    duck_out = [con.execute(f"SELECT {expr} FROM (SELECT ? AS text)", [t]).fetchone()[0]
                for t in SQL_PARITY_TEXTS]

    py_out = [scrub_string(t, PROFILE_SQL)[0] for t in SQL_PARITY_TEXTS]

    assert spark_out == duck_out == py_out


def test_scrub_udf_matches_scrub_string(spark):
    udf = make_scrub_udf(PROFILE_PYTHON)
    texts = [t for t, _, _ in EXACT_CASES]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = sdf.select(udf("text").alias("r")).select("r.*").collect()
    for t, row in zip(texts, rows):
        exp_text, exp_counts = scrub_string(t, PROFILE_PYTHON)
        assert row["scrubbed_text"] == exp_text
        assert dict(row["pii_counts"] or {}) == dict(exp_counts)


def test_pii_count_classes_filter_keeps_progressive_scrub(spark):
    from discoverx_spark.scrub import pii_count_exprs
    df = spark.createDataFrame(
        [(1, "visit http://10.0.0.1/path now")], "id long, text string")
    counts = dict(pii_count_exprs("text", classes=["ip_v4"]))
    got = df.select(counts["ip_v4"].alias("n")).first()["n"]
    # the URL rule scrubs first even when only ip_v4 is being counted, so
    # the IP inside the URL is NOT double-counted as a bare ip_v4
    full = dict(pii_count_exprs("text"))
    exp = df.select(full["ip_v4"].alias("n")).first()["n"]
    assert got == exp


def test_empty_toxicity_keywords_disable_gate(spark):
    from discoverx_spark.pipeline import PipelineConfig, decide
    df = spark.createDataFrame(
        [("c", 0, "user", "the and is to of in that it you for with was",
          None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    out = decide(df, PipelineConfig(toxicity_keywords=())).first()
    # an empty keyword tuple must DISABLE the gate, not match every word
    # boundary and drop the whole corpus
    assert out["toxicity_score"] == 0.0
    assert "toxicity" not in (out["drop_reasons"] or [])
