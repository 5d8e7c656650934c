"""Custom stateful streaming operator: cross-micro-batch exact dedup.

``applyInPandasWithState`` keeps a set of already-seen content hashes per
hash-bucket group; rows whose hash was seen in ANY earlier micro-batch are
dropped (first-seen wins). This is the streaming form of ``dedup_exact`` —
the state key is a bucket (``pmod(xxhash64(key), n_buckets)``) so state is
bounded per group and spreads across executors; per-group state holds only
the md5 hashes, not the payloads.

At 100 TB-scale ingest this is the dedup-on-arrival pattern: state size =
one 32-char hash per distinct document, partitioned over the cluster by
bucket; RocksDB state store handles spill in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id string, text string, h string"
STATE_SCHEMA = "seen array<string>"


def streaming_dedup(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """Streaming DF -> first-seen-wins deduplicated stream (append mode)."""

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh_mask = []
            for h in pdf["h"]:
                if h in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(h)
                    fresh_mask.append(True)
            out = pdf.loc[fresh_mask, ["doc_id", "text", "h"]]
            if len(out):
                yield out
        state.update((list(seen),))

    keyed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("h"),
        F.pmod(F.xxhash64(F.md5(F.col(text_col))), F.lit(n_buckets)).alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
