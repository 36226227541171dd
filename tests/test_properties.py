"""Property-based tests (hypothesis) over the pure-Python kernels —
fast driver-side checks of invariants the operators rely on at scale.
The reference has no property testing (SURVEY §5); these guard the
semantics the distributed plans assume."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from discoverx_spark.pipeline import PipelineConfig, make_row_scorer
from discoverx_spark.scrub import PROFILE_PYTHON, PROFILE_SQL, scrub_string

TEXT = st.text(
    alphabet=st.characters(codec="utf-8",
                           exclude_categories=("Cs",)),  # no lone surrogates
    max_size=400)
PIIISH = st.sampled_from([
    "mail me at a.b@c-d.org now", "ip 10.0.0.1 and 255.255.255.255",
    "card 1234-5678-9012-3456 exp 01/25", "ssn 123-45-6789",
    "call 123.456.7890", "see https://x.example.com/p?q=1",
    "::1234:5678 ipv6", "", "   \n  ", "plain words only here",
])


@given(st.one_of(TEXT, PIIISH))
@settings(max_examples=300, deadline=None)
def test_scrub_idempotent(text):
    """scrub(scrub(x)) == scrub(x) — redaction tokens must never re-match
    any rule (otherwise a second pass over already-scrubbed data corrupts
    it; resume paths can legitimately re-scrub)."""
    for profile in (PROFILE_PYTHON, PROFILE_SQL):
        once, _counts = scrub_string(text, profile)
        twice, counts2 = scrub_string(once, profile)
        assert twice == once and not counts2


@given(st.one_of(TEXT, PIIISH))
@settings(max_examples=200, deadline=None)
def test_scrub_never_none_and_no_raw_email_ip(text):
    out, _counts = scrub_string(text, PROFILE_PYTHON)
    assert out is not None
    assert not re.search(r"\b[\w.+-]+@[\w-]+\.[a-z]{2,}\b", out) or \
        "[REDACTED_EMAIL]" in out


_scorer = make_row_scorer(PipelineConfig().scrub_profile)


@given(st.one_of(TEXT, PIIISH, st.none()))
@settings(max_examples=300, deadline=None)
def test_row_scorer_total_and_bounded(text):
    """The fused-UDF kernel must accept ANY string (or null) and return
    bounded features — a single bad row must never kill an executor."""
    (scrubbed, counts, ppl, lang, lang_score, tox_hits, tox_score,
     n_tokens, n_chars, is_blank) = _scorer(text)
    assert ppl > 0
    assert 0.0 <= lang_score <= 1.0
    assert tox_hits >= 0 and tox_score >= 0
    assert n_tokens >= 0 and n_chars >= 0
    if text is None:
        assert is_blank and scrubbed is None
    else:
        assert n_chars == len(text)
        assert is_blank == (not text.strip())
        if scrubbed is not None:
            assert counts and sum(counts.values()) >= 1


@given(st.text(alphabet="ab \t\n", max_size=60))
@settings(max_examples=200, deadline=None)
def test_fingerprint_whitespace_invariant(text):
    """The dedup fingerprint normalization: any two texts equal up to
    whitespace runs / case / surrounding space must collapse together."""
    import hashlib

    def fp(t):
        return hashlib.md5(" ".join(t.lower().split()).encode()).hexdigest()

    assert fp(text) == fp("  " + text.replace(" ", "  ") + "\n")
