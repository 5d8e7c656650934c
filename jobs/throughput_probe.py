"""One executor-process worth of the headline throughput job.

Used by ``bench.py --scaling-multiproc`` (and runnable standalone): runs the
assemble -> kernel-extract -> count throughput stage in THIS process at the
given core count and prints one JSON line. Launching four of these
concurrently at 8 cores each is the faithful single-box stand-in for a
4N-executor cluster: four separate JVMs with separate heaps, GC, and Python
worker pools — exactly what `spark-submit` gives per executor — sharing the
machine the way four executors co-located on one host would. A single
local[32] JVM under-models that (one shared heap + allocator for all 32
tasks), which is why it is reported alongside, as the conservative number.

Usage: python jobs/throughput_probe.py <cores> <n_convs> <n_runs> [tag]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    tag = sys.argv[4] if len(sys.argv) > 4 else f"probe{cores}"

    from bench import _throughput_stage
    from rio_spark.session import get_spark

    spark = get_spark(app_name=f"rio_spark_{tag}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    r = _throughput_stage(spark, "0.1", cores, n_convs=n_convs, n_runs=n_runs)
    r["cores"] = cores
    r["tag"] = tag
    print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
