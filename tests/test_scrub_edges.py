"""Scrub edge cases: unicode, adjacency, overlaps, idempotence,
property-based determinism (hypothesis)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from discoverx_spark.scrub import PROFILE_PYTHON, scrub_string

CASES = [
    # unicode around PII
    ("écrivez à jean+dupont@exemple.fr s'il vous plaît",
     "écrivez à [REDACTED_EMAIL] s'il vous plaît"),
    # PII at string boundaries
    ("a@b.org", "[REDACTED_EMAIL]"),
    ("1.2.3.4", "[REDACTED_IP]"),
    # adjacent PII items separated by single spaces
    ("1.2.3.4 123-45-6789 1111-2222-3333-4444",
     "[REDACTED_IP] [REDACTED_SSN] [REDACTED_CC]"),
    # phone inside parentheses and punctuation-adjacent ssn
    ("call (123) 456-7890.", "call [REDACTED_PHONE]."),
    ("(ssn: 123-45-6789)", "(ssn: [REDACTED_SSN])"),
    # ipv4-like version strings untouched; real ip with port untouched tail
    ("upgrade to 10.0.1 now", "upgrade to 10.0.1 now"),
    # url with query keeps following prose
    ("see https://a.bc/d?e=1&f=2 and reply",
     "see [REDACTED_URL] and reply"),
    # ssn exclusion rules (000/666/9xx prefixes invalid)
    ("bad ssn 000-12-3456 stays", "bad ssn 000-12-3456 stays"),
    ("bad ssn 966-12-3456 stays", "bad ssn 966-12-3456 stays"),
    # credit card inside a longer digit-dash run is NOT a card
    ("id 1111-2222-3333-4444-5555 kept", "id 1111-2222-3333-4444-5555 kept"),
    # email with trailing dot (sentence end): tld boundary holds
    ("mail me at a.b@c.org.", "mail me at [REDACTED_EMAIL]."),
]


@pytest.mark.parametrize("text,expected", CASES, ids=range(len(CASES)))
def test_edge_cases(text, expected):
    assert scrub_string(text, PROFILE_PYTHON)[0] == expected


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_scrub_total_and_idempotent(s):
    out1, counts1 = scrub_string(s, PROFILE_PYTHON)
    out2, counts2 = scrub_string(s, PROFILE_PYTHON)
    assert out1 == out2 and counts1 == counts2      # deterministic
    again, _ = scrub_string(out1, PROFILE_PYTHON)
    assert again == out1                            # idempotent


@given(st.text(alphabet="0123456789-. ()@abcxyz:/", max_size=120))
@settings(max_examples=300, deadline=None)
def test_scrub_never_leaks_full_patterns(s):
    """After scrubbing, no full-string match of any anchored PII rule
    survives as a standalone token."""
    import re
    out, _ = scrub_string(s, PROFILE_PYTHON)
    ssn = re.compile(r"^(?!000|666|9)\d{3}-(?!00)\d{2}-(?!0000)\d{4}$")
    cc = re.compile(r"^\d{4}-\d{4}-\d{4}-\d{4}$")
    for tok in out.split():
        assert not ssn.match(tok), (s, out, tok)
        assert not cc.match(tok), (s, out, tok)
