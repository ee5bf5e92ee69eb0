"""Physical-plan audit for the headline queries: pushed filters, join
strategies, exchange counts, whole-stage-codegen coverage.

Usage: python tools/plan_audit.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from bench import HEADLINE
from hudi_utility_spark.session import get_spark


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> dict:
    return {
        # formatted plans print "(N) Exchange" with hashpartitioning on
        # the Arguments line below — count node headers, not inline text
        "shuffles": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "pushed": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        # numbered node headers only — the formatted plan repeats each
        # scan in its per-node detail section, which would double-count
        "scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "wscg": len(re.findall(r"WholeStageCodegen", plan)),
        "python": len(re.findall(r"(ArrowEvalPython|BatchEvalPython|MapInPandas)", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--all"]
    audit_all = "--all" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    name_filter = args[1] if len(args) > 1 else ""
    spark = get_spark("plan-audit")
    qs = entrymod.queries()
    names = sorted(qs) if audit_all else HEADLINE
    print(f"{'query':34s} shuf bcast bhj smj bnlj cart push scan py")
    for name in names:
        if name_filter and name_filter not in name:
            continue
        a = audit(plan_of(qs[name](spark, sf_dir)))
        flags = []
        if a["cartesian"]:
            flags.append("CARTESIAN!")
        if a["bnlj"]:
            flags.append("BNLJ")
        print(
            f"{name:34s} {a['shuffles']:4d} {a['broadcasts']:5d} {a['bhj']:3d}"
            f" {a['smj']:3d} {a['bnlj']:4d} {a['cartesian']:4d}"
            f" {a['pushed']:4d} {a['scans']:4d} {a['python']:2d}  {' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
