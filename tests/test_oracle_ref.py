"""The independent reference implementation (oracle_ref.reference_decide)
must agree byte-for-byte with the production feature closure
(pipeline.decide_pandas, which wraps make_row_scorer) — over the full
flagship input AND adversarial edge strings.  A disagreement here means a
real divergence the flagship oracle would then adjudicate."""

import pandas as pd
import pytest

from discoverx_spark.oracle_ref import reference_decide
from discoverx_spark.pipeline import decide_pandas
from discoverx_spark.transcripts import generate_transcripts_pandas

EDGE_TEXTS = [
    None, "", "   \n  ", "x", "the the the",
    # stopword stripping fallback: trailing punctuation, double-end strip
    "thanks, that answers me.", "(the)", "la, vie est belle, non?",
    "der, die. das!", "me...", "'me'",
    # scripts: CJK, cyrillic, greek below/above frac threshold, latin-1
    "中文字符串测试", "это русский текст", "ελληνικά", "mostly english ασδ",
    "café résumé naïve",  # latin-1 accents: non-ascii but no script range
    # PII packs (overlapping classes, adjacency guards)
    "mail a@b.com or visit https://x.io/p?q=1 from 10.0.0.1",
    "cc 1234-5678-9012-3456 ssn 123-45-6789 phone 123-456-7890",
    "ipv6 2001:db8:1:2:3:4:5:6 and 192.168.0.1.5 odd",
    "a@b.com.x 999-99-9999 000-12-3456",
    # toxicity phrase with whitespace run + case
    "Shut  Up you LOSER", "you are so stupid, this is useless",
    # perplexity edges: digits-only, single letter, long fluent english
    "12345 67890", "a", "q" * 50,
    "the patient engineer reads the query plan and checks the filter " * 5,
    # too_long gate
    "word " * 5000,
]


def test_reference_decide_matches_production_on_flagship_input():
    pdf = generate_transcripts_pandas(300, seed=42)
    a = reference_decide(pdf)
    b = decide_pandas(pdf)
    pd.testing.assert_frame_equal(a, b)


def test_reference_decide_matches_production_on_edges():
    pdf = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(len(EDGE_TEXTS))],
        "turn_idx": list(range(len(EDGE_TEXTS))),
        "role": ["user"] * len(EDGE_TEXTS),
        "text": EDGE_TEXTS,
    })
    pd.testing.assert_frame_equal(reference_decide(pdf), decide_pandas(pdf))


def test_reference_decide_is_feature_independent():
    """Guard the independence claim itself: oracle_ref must not import the
    production feature closure or the scrub helpers."""
    import ast
    import inspect

    import discoverx_spark.oracle_ref as mod
    tree = ast.parse(inspect.getsource(mod))
    banned = {"make_row_scorer", "make_features_udf", "scrub_string",
              "_compiled", "perplexity_of", "_ids", "make_langid_udf"}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            names = {a.name for a in node.names}
            assert not (names & banned), names & banned
        if isinstance(node, ast.Attribute):
            assert node.attr not in banned, node.attr
