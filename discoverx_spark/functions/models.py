"""Model-artifact I/O seam: external exports drop into the pipeline by path.

The production pipeline scores with real model exports — fastText lid.176
stopword/embedding tables, a KenLM n-gram matrix, a DCLM/fastText quality
classifier's term weights.  None of those binaries are installable in this
environment (LIMITATIONS §1), so the engine ships deterministic stand-ins
with identical plumbing.  This module is the seam that proves a real
export drops in with **zero code change**: convert the export offline to
one of the portable formats below, then load it by path and pass it
through the same public parameters the stand-ins use
(``make_perplexity_udf(lm=...)``, ``make_langid_udf(stopwords=...)``,
``quality_classifier_frame(weights=...)``).

Formats are chosen by file extension:

- ``.npy``      — raw numpy matrix (LM probability tables); bit-exact.
- ``.json``     — dict payloads (term weights, stopword tables).  JSON
                  floats round-trip IEEE-754 doubles exactly (shortest
                  repr), so scores are bit-identical after reload.
- ``.parquet``  — columnar (token, weight) / (lang, word) tables; the
                  natural interchange for 10^5-10^6-term classifier
                  vocabularies (a few MB, broadcast-join-ready).

Driver-side loads are metadata-sized (the largest artifact, a 10^6-term
weight table, is ~30 MB); per-executor distribution rides either a Spark
broadcast variable (``broadcast_model``) or a broadcast hash join
(``quality_classifier_join``), following the reference's broadcast
pattern (``/root/reference/examples/pii_detection_presidio.py:94-97``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def _ext(path: str) -> str:
    return os.path.splitext(str(path))[1].lower()


# --------------------------------------------------------------------------
# Char-LM matrix (KenLM-role artifact)
# --------------------------------------------------------------------------

def save_char_lm(lm: np.ndarray, path: str) -> None:
    """Persist a log-probability matrix from :func:`train_char_lm` (or a
    converted KenLM export).  ``.npy`` is bit-exact; ``.json`` stores the
    nested float lists (also exact — shortest-repr doubles)."""
    ext = _ext(path)
    if ext == ".npy":
        np.save(path, np.asarray(lm, dtype=np.float64))
    elif ext == ".json":
        with open(path, "w") as f:
            json.dump({"shape": list(lm.shape),
                       "logp": np.asarray(lm, dtype=np.float64).tolist()}, f)
    else:
        raise ValueError(f"unsupported LM format {ext!r} (use .npy/.json)")


def load_char_lm(path: str) -> np.ndarray:
    """Reload a matrix saved by :func:`save_char_lm`; byte-identical
    scores through ``make_perplexity_udf(lm=load_char_lm(p))`` (tested)."""
    ext = _ext(path)
    if ext == ".npy":
        return np.load(path)
    if ext == ".json":
        with open(path) as f:
            payload = json.load(f)
        lm = np.asarray(payload["logp"], dtype=np.float64)
        return lm.reshape(payload["shape"])
    raise ValueError(f"unsupported LM format {ext!r} (use .npy/.json)")


# --------------------------------------------------------------------------
# Classifier term weights (fastText / DCLM-role artifact)
# --------------------------------------------------------------------------

def save_term_weights(weights: Dict[str, float], path: str) -> None:
    """Persist a {token: weight} table.  ``.parquet`` writes a two-column
    (token, weight) frame — the interchange shape a converted fastText /
    DCLM linear model exports to, and exactly what
    ``quality_classifier_join`` broadcasts."""
    ext = _ext(path)
    if ext == ".json":
        with open(path, "w") as f:
            json.dump({k: float(v) for k, v in weights.items()}, f)
    elif ext == ".parquet":
        import pandas as pd

        toks = sorted(weights)
        pd.DataFrame({
            "token": toks,
            "weight": [float(weights[t]) for t in toks],
        }).to_parquet(path, index=False)
    else:
        raise ValueError(
            f"unsupported weights format {ext!r} (use .json/.parquet)")


def load_term_weights(path: str) -> Dict[str, float]:
    ext = _ext(path)
    if ext == ".json":
        with open(path) as f:
            return {k: float(v) for k, v in json.load(f).items()}
    if ext == ".parquet":
        import pandas as pd

        pdf = pd.read_parquet(path, columns=["token", "weight"])
        return dict(zip(pdf["token"], (float(w) for w in pdf["weight"])))
    raise ValueError(
        f"unsupported weights format {ext!r} (use .json/.parquet)")


# --------------------------------------------------------------------------
# Language-ID stopword tables (fastText-lid-role artifact)
# --------------------------------------------------------------------------

def save_stopwords(tables: Dict[str, List[str]], path: str) -> None:
    """Persist {lang: [word, ...]} tables (extracted from a lid model's
    most-discriminative tokens, or hand-curated)."""
    ext = _ext(path)
    if ext == ".json":
        with open(path, "w") as f:
            json.dump({k: list(v) for k, v in tables.items()}, f)
    elif ext == ".parquet":
        import pandas as pd

        rows = [(lang, w) for lang in sorted(tables)
                for w in tables[lang]]
        pd.DataFrame(rows, columns=["lang", "word"]).to_parquet(
            path, index=False)
    else:
        raise ValueError(
            f"unsupported stopwords format {ext!r} (use .json/.parquet)")


def load_stopwords(path: str) -> Dict[str, List[str]]:
    ext = _ext(path)
    if ext == ".json":
        with open(path) as f:
            return {k: list(v) for k, v in json.load(f).items()}
    if ext == ".parquet":
        import pandas as pd

        pdf = pd.read_parquet(path, columns=["lang", "word"])
        out: Dict[str, List[str]] = {}
        for lang, word in zip(pdf["lang"], pdf["word"]):
            out.setdefault(lang, []).append(word)
        return out
    raise ValueError(
        f"unsupported stopwords format {ext!r} (use .json/.parquet)")


# --------------------------------------------------------------------------
# Once-per-session executor distribution
# --------------------------------------------------------------------------

_BROADCASTS: dict = {}


def content_key(prefix: str, payload_bytes: bytes) -> str:
    """Collision-resistant cache key for :func:`broadcast_model` — a
    sha256 digest of the payload's byte serialization.  Callers must NOT
    key on Python ``hash()`` (32/64-bit, collides at scale, and salted
    per-process for str/bytes): a collision would silently reuse the
    WRONG model for every row the UDF touches."""
    import hashlib

    return f"{prefix}_{hashlib.sha256(payload_bytes).hexdigest()}"


def broadcast_model(spark, key: str, loader, path: Optional[str] = None):
    """Load a model artifact once per (session, key) and ship it to the
    executors as a Spark broadcast variable — the closure then carries a
    tiny broadcast handle instead of re-pickling the payload into every
    task (reference presidio ex.:94-97).

    ``loader`` is a zero-arg callable (or one of the ``load_*`` functions
    above, in which case ``path`` is passed to it).  Returns the
    ``Broadcast``; call ``.value`` inside the UDF.  Key with
    :func:`content_key`, never ``hash()``."""
    app_id = spark.sparkContext.applicationId
    # PySpark permits ONE active SparkContext per process, so every cache
    # entry under a different applicationId belongs to a stopped session:
    # its broadcast handle is dead weight (and unusable).  Evict them here
    # so a long-lived process cycling sessions doesn't leak payloads.
    stale = [k for k in _BROADCASTS if k[0] != app_id]
    for k in stale:
        del _BROADCASTS[k]
    sc_key = (app_id, key)
    if sc_key not in _BROADCASTS:
        payload = loader(path) if path is not None else loader()
        _BROADCASTS[sc_key] = spark.sparkContext.broadcast(payload)
    return _BROADCASTS[sc_key]
