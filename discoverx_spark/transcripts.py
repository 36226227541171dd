"""Deterministic synthetic multi-turn transcripts generator.

Produces the pipeline's input table in exactly the ``BASELINE.json:input_hint``
shape: ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``.

Scale-correct by construction: generation is *distributed* — one
deterministic pseudo-random stream per conversation, seeded from
``(seed, conv index)``, materialized with ``mapInPandas`` over a
``spark.range`` of conversation indexes.  The same (seed, n_convs) always
yields byte-identical rows regardless of partitioning, executor count, or
resume boundaries (FIXTURES.md F1 determinism requirement).

Skew is intentional (FIXTURES.md F1): a configurable fraction of "hot"
conversations carries a large multiple of the median turn count, so the
conv-level groupBy path (operators/convagg.py) actually exercises
salting + AQE skew handling.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

# sentence fragments (original text, assembled pseudo-randomly)
_EN_SENTENCES = [
    "Can you help me configure the cluster for the nightly batch job?",
    "The aggregation step keeps spilling to disk when the input grows.",
    "I checked the logs and the executor lost heartbeat after the join.",
    "Let's broadcast the smaller table and retry the query plan.",
    "That fixed it, the shuffle stage is gone from the plan now.",
    "Please summarize the last deployment and list any failed tasks.",
    "The metrics dashboard shows a spike in latency around midnight.",
    "We should repartition by the customer key before the window step.",
    "Thanks, that answers my question about the retention policy.",
    "The schema migration completed without any dropped columns.",
]
_DE_SENTENCES = [
    "Der Auftrag ist gestern ohne Fehler durchgelaufen und die Daten sind da.",
    "Ich habe die Konfiguration mit einem neuen Wert für den Speicher geändert.",
]
_FR_SENTENCES = [
    "Le travail est terminé et les résultats sont dans la table de sortie.",
    "Je ne vois pas les données dans le rapport pour cette période.",
]
_ES_SENTENCES = [
    "El trabajo terminó sin errores y los datos ya están en la tabla.",
    "No puedo ver los resultados para la fecha que me diste ayer.",
]
_BOILERPLATE = "I agree to the terms and conditions."
_TOXIC_SNIPPETS = [
    "you are so stupid, this is useless",
    "shut up, that idea is idiotic",
]
_PII_SNIPPETS = [
    "my email is jane.doe+test@example-corp.com",
    "reach me at 123-456-7890 after lunch",
    "the card on file is 1234-5678-9012-3456",
    "ssn for the form: 123-45-6789",
    "the host is at 192.168.10.42 internally",
    "docs live at https://docs.example.com/path?x=1",
    "ipv6 probe from 2001:db8:1:2:3:4:5:6 failed",
]
_TOOLS = ["search", "python", "sql_runner", "browser"]


def _conv_rows(conv_index: int, seed: int, hot_frac: float, hot_turns: int,
               base_turns: int) -> list:
    rng = np.random.RandomState((seed * 1_000_003 + conv_index) % (2**31 - 1))
    conv_id = f"conv-{seed}-{conv_index:08d}"
    is_hot = rng.rand() < hot_frac
    n_turns = int(hot_turns + rng.randint(0, hot_turns)) if is_hot \
        else int(2 + rng.randint(0, base_turns))
    rows = []
    for t in range(n_turns):
        role = ["user", "assistant"][t % 2]
        tool = None
        draw = rng.rand()
        if draw < 0.04:
            role, tool = "tool", _TOOLS[rng.randint(0, len(_TOOLS))]
        elif draw < 0.06:
            role = "system"

        u = rng.rand()
        if u < 0.02:
            text = ""
        elif u < 0.03:
            text = "   \n  "
        elif u < 0.10:
            text = _BOILERPLATE
        elif u < 0.16:
            pool = (_DE_SENTENCES, _FR_SENTENCES, _ES_SENTENCES)[rng.randint(0, 3)]
            text = pool[rng.randint(0, len(pool))]
        elif u < 0.19:
            text = _TOXIC_SNIPPETS[rng.randint(0, len(_TOXIC_SNIPPETS))]
        else:
            k = 1 + rng.randint(0, 3)
            parts = [_EN_SENTENCES[rng.randint(0, len(_EN_SENTENCES))]
                     for _ in range(k)]
            if rng.rand() < 0.12:
                parts.insert(rng.randint(0, len(parts) + 1),
                             _PII_SNIPPETS[rng.randint(0, len(_PII_SNIPPETS))])
            text = " ".join(parts)
        ts = pd.Timestamp(_BASE_TS) + pd.Timedelta(
            days=int(conv_index % 28), seconds=int(t * 37 + rng.randint(0, 11)))
        rows.append((conv_id, t, role, text, tool, ts))
    return rows


def generate_transcripts(spark: SparkSession, n_convs: int, seed: int = 42,
                         hot_frac: float = 0.01, hot_turns: int = 120,
                         base_turns: int = 10,
                         num_partitions: Optional[int] = None) -> DataFrame:
    """Distributed deterministic transcripts table (~``n_convs * 6`` turns)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_index in pdf["id"]:
                out.extend(_conv_rows(int(conv_index), seed, hot_frac,
                                      hot_turns, base_turns))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text",
                              "tool", "ts"])

    rng_df = spark.range(n_convs, numPartitions=num_partitions)
    return rng_df.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)


def generate_transcripts_pandas(n_convs: int, seed: int = 42,
                                hot_frac: float = 0.01, hot_turns: int = 120,
                                base_turns: int = 10) -> pd.DataFrame:
    """Driver-local variant (tests / oracle cross-checks)."""
    rows = []
    for i in range(n_convs):
        rows.extend(_conv_rows(i, seed, hot_frac, hot_turns, base_turns))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                       "tool", "ts"])
