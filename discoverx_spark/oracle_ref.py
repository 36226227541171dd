"""Independent driver-side reference implementation of the transcripts
pipeline — the expected-output source for the flagship correctness oracle.

This module shares NO feature code with the production path
(:func:`discoverx_spark.pipeline.make_row_scorer` / the fused Arrow UDF):
scrub, language ID, perplexity, toxicity, token stats, and the keep/drop
gates are all re-implemented here from the same *specification data*
(pattern strings in ``scrub.SCRUB_RULES``, stopword lists and script
ranges in ``functions.text``, the trained ``CHAR_LM`` matrix — data is the
contract, code is what must be independent).  Divergence between the two
implementations is exactly what the correctness gate exists to catch;
``tests/test_oracle_ref.py`` asserts equality over the full generated
flagship input plus adversarial edge strings.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

from .functions.perplexity import CHAR_LM, V
from .functions.text import _LANG_ORDER, _SCRIPTS, LANG_STOPWORDS, TOXIC_KEYWORDS
from .pipeline import DECISION_COLUMNS, PipelineConfig
from .scrub import SCRUB_RULES

_STRIP = ".,;:!?\"'()"
# hoisted: building these per call meant once-per-row set construction
sets = {l: frozenset(ws) for l, ws in LANG_STOPWORDS.items()}
known = frozenset().union(*sets.values())


def _lang_of(text: str, words: list) -> tuple:
    """Script-range ID for non-ASCII text, stopword density otherwise.
    Tie-breaks: scripts → alphabetically smallest among max counts;
    stopwords → earliest language in _LANG_ORDER with the max hits."""
    if not text.isascii():
        counts = {}
        for ch in text:
            cp = ord(ch)
            if cp < 0x300:
                continue
            for lang, lo, hi in _SCRIPTS:
                if lo <= cp <= hi:
                    counts[lang] = counts.get(lang, 0) + 1
                    break
        if counts:
            top = max(counts.values())
            best = sorted(l for l, c in counts.items() if c == top)[0]
            frac = counts[best] / max(len(text), 1)
            if frac > 0.15:
                return best, min(1.0, frac * 2)
    if not words:
        return "und", 0.0
    hits = {l: 0 for l in _LANG_ORDER}
    for w in words:
        if w in known:
            key = w
        elif w and w[-1] in _STRIP:
            key = w.strip(_STRIP)
        else:
            continue
        for l in _LANG_ORDER:
            if key in sets[l]:
                hits[l] += 1
    best_hits = max(hits.values())
    if best_hits == 0:
        return "und", 0.0
    best = next(l for l in _LANG_ORDER if hits[l] == best_hits)
    return best, min(1.0, best_hits / len(words) * 2)


def _perplexity(lowered: str) -> float:
    """Char-bigram perplexity over the 27-symbol canonical form: letters
    pass through, every non-letter run (incl. the '?' that non-ASCII maps
    to) collapses to one space; leading/trailing runs vanish."""
    ascii_form = lowered.encode("ascii", "replace").decode("ascii")
    canon = " ".join(re.findall(r"[a-z]+", ascii_form))
    ids = np.array([26 if ch == " " else ord(ch) - 97 for ch in canon],
                   dtype=np.int64)
    if ids.size < 2:
        return float(V)
    logp = CHAR_LM[ids[:-1], ids[1:]]
    return float(np.exp(-logp.sum() / logp.size))


def _scrub(text: str, rules: list) -> tuple:
    counts = {}
    for name, rx, token in rules:
        text, n = rx.subn(token, text)
        if n:
            counts[name] = n
    return text, counts


def reference_decide(turns: pd.DataFrame,
                     cfg: PipelineConfig = PipelineConfig()) -> pd.DataFrame:
    """Per-turn decisions in the driver, matching
    :func:`discoverx_spark.pipeline.decide` byte-for-byte — same output
    canonicalization as the flagship query (drop_reasons joined with ',',
    pii_counts as sorted-key JSON)."""
    kws = (list(cfg.toxicity_keywords)
           if cfg.toxicity_keywords is not None else TOXIC_KEYWORDS)
    # independently-coded twin of functions.text.toxicity_pattern (this
    # module must share no feature code with the production path):
    # escaped keywords, whitespace-run joins, empty list disables
    kws = [k for k in kws if k and k.strip()]
    tox_rx = re.compile(
        r"\b(?:" + "|".join(
            r"\s+".join(re.escape(w) for w in k.split())
            for k in kws) + r")\b") if kws else None
    rules = [(r.class_name, re.compile(r.pattern), r.token)
             for r in SCRUB_RULES]

    out = []
    for conv_id, turn_idx, role, text in zip(
            turns["conv_id"], turns["turn_idx"], turns["role"],
            turns["text"]):
        if text is None:
            lang, lang_score, ppl = "und", 0.0, float(V)
            tox_score, n_tokens, n_chars = 0.0, 0, 0
            is_blank, scrubbed, counts = True, None, {}
            tox_hits = 0
        else:
            lowered = text.lower()
            words = lowered.split()
            n_tokens, n_chars = len(words), len(text)
            is_blank = not text.strip()
            lang, lang_score = _lang_of(text, words)
            tox_hits = (len(tox_rx.findall(lowered))
                        if tox_rx is not None else 0)
            tox_score = tox_hits / max(n_tokens, 1)
            ppl = _perplexity(lowered)
            scrubbed, counts = _scrub(text, rules)

        reasons = []
        if is_blank:
            reasons.append("empty")
        if not is_blank and n_tokens < cfg.min_tokens:
            reasons.append("too_short")
        if n_chars > cfg.max_chars:
            reasons.append("too_long")
        substantive = (not is_blank) and n_tokens >= cfg.min_tokens
        lang_ok = lang in cfg.allowed_langs
        if substantive and not lang_ok:
            reasons.append("non_target_lang")
        if substantive and lang_ok and ppl > cfg.max_perplexity:
            reasons.append("high_perplexity")
        if tox_hits >= cfg.max_toxicity_hits:
            reasons.append("toxicity")
        out.append((
            conv_id, int(turn_idx), role, lang, lang_score, ppl,
            json.dumps(dict(sorted(counts.items())), separators=(",", ":")),
            tox_score, not reasons, ",".join(reasons),
            scrubbed if scrubbed is not None else text,
        ))
    return pd.DataFrame(out, columns=DECISION_COLUMNS)
