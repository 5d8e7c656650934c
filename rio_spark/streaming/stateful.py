"""Custom stateful streaming operator: cross-micro-batch exact dedup.

``applyInPandasWithState`` keeps a set of already-seen content hashes per
hash-bucket group; rows whose hash was seen in ANY earlier micro-batch are
dropped (first-seen wins). This is the streaming form of ``dedup_exact`` —
the state key is a bucket (``pmod(xxhash64(key), n_buckets)``) so state is
bounded per group and spreads across executors; per-group state holds only
the md5 hashes, not the payloads.

At 100 TB-scale ingest this is the dedup-on-arrival pattern: state size =
one 32-char hash per distinct document, partitioned over the cluster by
bucket; RocksDB state store handles spill in production. For unbounded
streams, ``max_state_per_bucket`` caps state with deterministic oldest-first
eviction (sliding-window dedup).
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
    n_buckets: int = 32, max_state_per_bucket: int | None = None,
) -> DataFrame:
    """Streaming DF -> first-seen-wins deduplicated stream (append mode).

    ``max_state_per_bucket`` bounds per-group state for unbounded streams:
    when set, the oldest hashes (first-seen order, deterministic) are evicted
    once the bucket exceeds the cap, turning exact dedup into sliding-window
    dedup — a duplicate arriving after its hash was evicted is re-admitted.
    Total state <= n_buckets * cap * 32 bytes regardless of stream length;
    leave ``None`` for exact dedup (state = one md5 per distinct document,
    RocksDB-backed in production)."""

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        order = list(state.get[0]) if state.exists else []
        seen = set(order)
        for pdf in pdfs:
            fresh_mask = []
            for h in pdf["h"]:
                if h in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(h)
                    order.append(h)
                    fresh_mask.append(True)
            out = pdf.loc[fresh_mask, ["doc_id", "text", "h"]]
            if len(out):
                yield out
        if max_state_per_bucket is not None and len(order) > max_state_per_bucket:
            order = order[-max_state_per_bucket:]  # evict oldest, keep order
        state.update((order,))

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
