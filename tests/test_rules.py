"""Rule-corpus parity tests.

The match/nomatch examples ported from the reference
(/root/reference/discoverx/rules.py:114-510) are the classification
contract; F1 vs reference labels over this corpus must be 1.0 (≥0.99 gate,
BASELINE.md).
"""

import re

import pytest

from discoverx_spark.rules import GLOBAL_RULES, LOCALIZED_RULES, RegexRule, Rules

ALL_RULES = list(GLOBAL_RULES) + list(LOCALIZED_RULES["us"])


def test_rule_counts_match_reference():
    # reference tests/unit/rules_test.py: 12 global, 18 with US locale
    assert len(GLOBAL_RULES) == 12
    assert len(Rules(locale="us").builtin_rules) == 18
    assert len(Rules().builtin_rules) == 12


@pytest.mark.parametrize("rule", ALL_RULES, ids=lambda r: r.name)
def test_match_examples(rule):
    for ex in rule.match_examples:
        assert rule.matches(ex), (rule.name, ex)


@pytest.mark.parametrize("rule", ALL_RULES, ids=lambda r: r.name)
def test_nomatch_examples(rule):
    for ex in rule.nomatch_examples:
        assert not rule.matches(ex), (rule.name, ex)


def test_corpus_f1_vs_reference_labels():
    """Keep/drop F1 vs reference labels (re.match on the reference patterns)
    computed over the full example corpus — must be 1.0."""
    tp = fp = fn = 0
    for rule in ALL_RULES:
        ref = re.compile(rule.pattern)  # identical pattern = reference labeler
        for ex in rule.match_examples:
            ours, theirs = rule.matches(ex), bool(ref.match(ex))
            tp += ours and theirs
            fp += ours and not theirs
            fn += theirs and not ours
        for ex in rule.nomatch_examples:
            ours, theirs = rule.matches(ex), bool(ref.match(ex))
            tp += ours and theirs
            fp += ours and not theirs
            fn += theirs and not ours
    f1 = 2 * tp / (2 * tp + fp + fn) if tp else 1.0
    assert f1 >= 0.99


def test_validation_rejects_bad_examples():
    with pytest.raises(ValueError):
        RegexRule("bad", "d", r"^\d+$", match_examples=("abc",))
    with pytest.raises(ValueError):
        RegexRule("bad", "d", r"^\d+$", nomatch_examples=("123",))


def test_wildcard_filtering():
    rules = Rules(locale="us")
    assert [r.name for r in rules.get_rules("*v4")] == ["ip_v4"]
    assert [r.name for r in rules.get_rules("ip_*")] == ["ip_v4", "ip_v6"]
    assert len(rules.get_rules("*")) == 18
    custom = RegexRule("device_id", "d", r"^DEV-\d{6}$",
                       match_examples=("DEV-123456",), nomatch_examples=("DEV-1",))
    rules2 = Rules(custom_rules=[custom])
    assert "device_id" in [r.name for r in rules2.get_rules("*")]


def test_unsupported_locale():
    with pytest.raises(ValueError):
        Rules(locale="xx")


def test_match_search_term():
    rules = Rules(locale="us")
    found = rules.match_search_term("192.1.1.1")
    assert "ip_v4" in found
    assert "us_phone_number" not in found
