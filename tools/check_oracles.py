"""Local replica of the driver's correctness gate: run every queries()
entry against its DuckDB oracle at a given SF and report row-count /
schema / value-hash agreement.

Usage: python tools/check_oracles.py [sf_dir] [name_filter]
                                     [--json-out=PATH]

--json-out writes an auditable per-query record (git sha, UTC stamp,
ok/err per query) — preflight merges the two halves into
GATE_LOCAL.json at the repo root so the "414/414 local gate" claim is
an inspectable artifact, not prose.
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from hudi_utility_spark.session import get_spark
from hudi_utility_spark.tables import TABLE_NAMES


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style float normalization: repr of rounded value
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    for a in sys.argv[1:]:
        if not a.startswith("--"):
            continue
        if a.startswith("--json-out="):
            json_out = a.split("=", 1)[1]
        else:
            # a typo'd flag ("--json-out PATH", "--jsonout=x") used to
            # be silently dropped — the run produced no artifact and no
            # warning, leaving a stale GATE_LOCAL.json as "evidence"
            print(f"error: unrecognized flag {a!r} "
                  "(supported: --json-out=PATH)", file=sys.stderr)
            return 2
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1] if len(args) > 1 else ""
    spark = get_spark("oracle-check")
    per_query: dict[str, dict] = {}
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    checked = 0
    for name, fn in sorted(qs.items()):
        if name_filter and not __import__("re").search(name_filter, name):
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            failures.append(name)
            per_query[name] = {"ok": False, "err": f"spark error: {str(exc)[:200]}"}
            print(f"FAIL  {name}: spark error: {str(exc)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            per_query[name] = {
                "ok": len(srows) > 0, "rows": len(srows), "mode": "rows_only",
            }
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            per_query[name] = {"ok": False, "err": f"oracle error: {str(exc)[:200]}"}
            print(f"FAIL  {name}: oracle error: {str(exc)[:200]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sh = value_hash([tuple(r) for r in srows], scols)
            dh = value_hash(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a sample difference
                sset = {
                    "|".join(
                        _norm_cell(t[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for t in (tuple(r) for r in srows)
                }
                dset = {
                    "|".join(
                        _norm_cell(t[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for t in drows
                }
                only_s = list(sset - dset)[:2]
                only_d = list(dset - sset)[:2]
                if only_s:
                    problems.append(f"spark-only: {only_s}")
                if only_d:
                    problems.append(f"duck-only: {only_d}")
        if problems:
            failures.append(name)
            per_query[name] = {"ok": False, "err": "; ".join(problems)[:400]}
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            per_query[name] = {"ok": True, "rows": len(srows)}
            print(f"ok    {name}: {len(srows)} rows")
    print(f"\n{checked - len(failures)}/{checked} checked queries agree ({len(qs)} registered)")
    if json_out:
        import datetime as _dt
        import json as _json
        import subprocess as _sp

        root = Path(__file__).resolve().parent.parent
        try:
            sha = _sp.check_output(
                ["git", "rev-parse", "HEAD"], cwd=root
            ).decode().strip()
            dirty = bool(
                _sp.check_output(
                    ["git", "status", "--porcelain", "--", ":!*.json"],
                    cwd=root,
                ).strip()
            )
        except Exception:
            sha, dirty = None, None
        import pyspark as _ps

        Path(json_out).write_text(_json.dumps({
            "git_sha": sha,
            "tree_dirty": dirty,
            # engine versions: lets a driver-session red be confirmed
            # or ruled out as version skew vs this local gate run
            "pyspark_version": _ps.__version__,
            "duckdb_version": duckdb.__version__,
            "utc": _dt.datetime.now(_dt.timezone.utc).isoformat(
                timespec="seconds"
            ),
            "sf_dir": sf_dir,
            "checked": checked,
            "agree": checked - len(failures),
            "registered": len(qs),
            "results": per_query,
        }, indent=0, sort_keys=True) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
