"""Double-run determinism sweep: invoke every ``queries()`` entry TWICE
in the same Spark session and assert the value hash is bit-stable across
runs.

This targets the failure class that made r3's ``rtr_inverted_index`` and
r6's ``src_synth_stream`` driver-red while locally green: a query whose
result depends on execution environment (task scheduling order inside a
collect_list, micro-batch replay under load, unordered set semantics
leaking into a string) hashes differently run-to-run even though a single
run agrees with the oracle. A query that is hash-stable here AND
oracle-green in check_oracles.py is environment-insensitive by
construction.

Usage: python tools/hash_stability.py [sf_dir] [name_filter]
Exit 0 iff every checked query produced identical (rowcount, schema,
value-hash) on both invocations.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from hudi_utility_spark.session import get_spark
from tools.check_oracles import value_hash


def run_once(fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    rows = df.collect()
    cols = df.columns
    return len(rows), sorted(cols), value_hash(
        [tuple(r) for r in rows], cols
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("hash-stability")
    qs = entrymod.queries()
    failures = []
    checked = 0
    for name, fn in sorted(qs.items()):
        if name_filter and not re.search(name_filter, name):
            continue
        checked += 1
        try:
            a = run_once(fn, spark, sf_dir)
            b = run_once(fn, spark, sf_dir)
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: error: {str(exc)[:200]}")
            continue
        if a != b:
            failures.append(name)
            detail = []
            if a[0] != b[0]:
                detail.append(f"rows {a[0]} vs {b[0]}")
            if a[1] != b[1]:
                detail.append("schema drift")
            if a[2] != b[2]:
                detail.append("value-hash drift")
            print(f"FAIL  {name}: " + "; ".join(detail))
        else:
            print(f"ok    {name}: stable ({a[0]} rows)")
        # cache hygiene between queries, mirroring bench.py
        spark.catalog.clearCache()
    print(
        f"\n{checked - len(failures)}/{checked} queries double-run "
        f"hash-stable ({len(qs)} registered)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
