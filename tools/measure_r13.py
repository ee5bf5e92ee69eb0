"""Round-12 measurement helper: for each named query, time the
DataFrame *construction* (driver-side work: collects inside multi-pass
operators, plan building) separately from the noop *materialization*,
and save `.explain("formatted")` to plans/r13/<name>_<tag>.txt.

Usage: python tools/measure_r13.py <tag> <sf_dir> name [name ...]
       (tag is e.g. "before" / "after"; reps via SPARK_GRAFT_MEASURE_REPS)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from hudi_utility_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2]
    names = sys.argv[3:]
    reps = int(os.environ.get("SPARK_GRAFT_MEASURE_REPS", "3"))
    outdir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("measure-r13")
    qs = entrymod.queries()
    # one warmup pass over the requested names
    for name in names:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"WARMUP-ERR {name}: {e}")
        spark.catalog.clearCache()
    print(f"{'query':34s} {'build_s':>8s} {'exec_s':>8s} {'total_s':>8s}")
    for name in names:
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark.catalog.clearCache()
        builds.sort()
        execs.sort()
        b, e = builds[reps // 2], execs[reps // 2]
        print(f"{name:34s} {b:8.3f} {e:8.3f} {b + e:8.3f}")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        (outdir / f"{name}_{tag}.txt").write_text(buf.getvalue())


if __name__ == "__main__":
    main()
