#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

The headline metric is extraction throughput (triples/sec through the full
assemble -> mapInPandas-kernel path) plus per-query wall times. Run with
SPARK_GRAFT_CPUS=8 and =32 on the same input to produce the two-cluster-size
scaling evidence recorded in BENCH/BASELINE.md (efficiency =
(thr@32 / thr@8) / 4).
"""

from __future__ import annotations

import json
import os
import sys
import time


BENCH_QUERIES = [
    "kg_extract_nt",
    "kg_extract_turtle",
    "kg_error_recovery",
    "kg_assembly",
    "kg_entity_linking",
    "kg_connected_components",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "text_langid",
    "text_quality",
    "text_fingerprint",
    "sim_topk",
    "sim_lsh_buckets",
    "tpch_q1",
    "tpch_q5",
    "window_topk",
    "events_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from rio_spark.session import get_spark
    from rio_spark.plans.catalog import QUERIES

    spark = get_spark(app_name=f"rio_spark_bench_{cpus}", cores=cpus,
                      shuffle_partitions=max(cpus, 8))

    # warm the JVM + Arrow path once so per-query timings measure the plan,
    # not session startup
    QUERIES["tpch_q6"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    extract_rows = 0
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        if name == "kg_extract_nt":
            extract_rows = n

    total = round(sum(timings.values()), 3)
    triples_per_sec = round(extract_rows / timings["kg_extract_nt"], 1) if extract_rows else 0.0
    out = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "kg_extract_triples": extract_rows,
        "kg_extract_triples_per_sec": triples_per_sec,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
