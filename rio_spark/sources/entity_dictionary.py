"""Synthetic entity candidate dictionary (FIXTURES.md T4).

Small enough to broadcast (J1); ``candidate_block`` is the blocking key for
the large×large skew-hinted join path (J2). Deterministic, derived only from
the module's entity list; a few mention keys are intentionally ambiguous
(multiple candidates) so resolution has to rank by prior.
"""

from __future__ import annotations

import re

import pandas as pd

from rio_spark.sources.transcripts import ENTITIES

DICT_COLUMNS = ["mention_key", "candidate_iri", "candidate_block", "prior"]

KG_NS = "http://kg.example/entity/"


def _slug(name: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", name.lower()).strip("_")


def entity_dictionary_pdf() -> pd.DataFrame:
    rows = []
    for ent in ENTITIES:
        key = ent.lower()
        block = key.split()[0]
        rows.append((key, f"{KG_NS}{_slug(ent)}", block, 0.9))
        # ambiguous second candidate for multi-word entities
        if " " in ent:
            rows.append((key, f"{KG_NS}{_slug(ent)}_alt", block, 0.4))
    # alias rows: surname-only mentions of people map to the same entity
    for ent in ENTITIES:
        parts = ent.lower().split()
        if len(parts) == 2 and parts[1] not in {"corp", "industries", "enterprises"}:
            rows.append((parts[1], f"{KG_NS}{_slug(ent)}", parts[1], 0.6))
    return pd.DataFrame(rows, columns=DICT_COLUMNS)


def entity_dictionary(spark):
    return spark.createDataFrame(entity_dictionary_pdf())
