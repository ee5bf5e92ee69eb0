"""A/B probe for VERDICT r12 item 7: does letting AQE coalesce to byte-
sized partitions (parallelismFirst=false + small advisory) help the
shuffle-light headline queries at local[32] without hurting the
compute-bound ones?

Runs each named query N times alternating conf OFF/ON in ONE session
(conf set via spark.conf — both AQE knobs are runtime-settable), warm,
noop sink, interleaved so host drift hits both arms equally.

Usage: python tools/ab_aqe_r13.py <sf_dir> name [name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from hudi_utility_spark.session import get_spark

KNOBS = {
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
}


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    spark = get_spark("ab-aqe-r13")
    qs = entrymod.queries()
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    results: dict[str, dict[str, list[float]]] = {
        n: {"off": [], "on": []} for n in names
    }
    for _ in range(reps):
        for arm in ("off", "on"):
            for k, v in KNOBS.items():
                if arm == "on":
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)
            for name in names:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                results[name][arm].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    print(f"{'query':34s} {'off_med':>8s} {'on_med':>8s} {'ratio':>6s}")
    for name in names:
        off = statistics.median(results[name]["off"])
        on = statistics.median(results[name]["on"])
        print(f"{name:34s} {off:8.3f} {on:8.3f} {off / on:6.2f}")


if __name__ == "__main__":
    main()
