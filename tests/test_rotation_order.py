"""The driver-draw rotation in __spark_entry__.queries() — pure-logic
tests (no Spark session): reds-first, never-drawn rotation, numeric
round ordering (the r10 advice: lexical sort put r100 before r11 and
inverted latest-red status).
"""

import json
import re
from pathlib import Path

from __spark_entry__ import _rotation_order

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}


def test_reds_at_latest_draw_go_first():
    names = ["a", "b", "c", "d"]
    rounds = [{"a": GREEN, "b": RED}, {"b": RED, "c": GREEN}]
    order = _rotation_order(names, rounds)
    assert order[0] == "b"  # red at its most recent draw
    assert order[1] == "d"  # never drawn
    assert set(order[2:]) == {"a", "c"}  # drawn green at the back


def test_red_then_green_clears_red_status():
    names = ["a", "b"]
    rounds = [{"a": RED}, {"a": GREEN}]
    order = _rotation_order(names, rounds)
    assert order == ["b", "a"]  # a cleared; never-drawn b leads


def test_error_row_counts_as_red():
    names = ["a", "b"]
    rounds = [{"a": {**GREEN, "err": "boom"}}]
    assert _rotation_order(names, rounds)[0] == "a"


def test_fresh_rotates_by_fifty_per_round():
    names = [f"q{i:03d}" for i in range(120)]
    none_ = _rotation_order(names, [])
    one = _rotation_order(names, [{}])
    two = _rotation_order(names, [{}, {}])
    assert none_ == names
    assert one == names[50:] + names[:50]
    assert two == names[100:] + names[:100]


def test_round_files_sort_numerically_not_lexically(tmp_path):
    """r100 sorts before r11 lexically; the entry module must order by
    the numeric round so 'latest draw wins' stays true past round 99.
    Exercises the same key function queries() uses."""

    def _round_no(p: Path) -> int:
        m = re.search(r"_r(\d+)", p.stem)
        return int(m.group(1)) if m else 0

    # q was red at r9, fixed and drawn green at r100; lexical order ends
    # on r9 (r100 < r11 < r9 lexically) and would wrongly resurrect the
    # red, numeric order correctly ends on r100 and clears it.
    for rnd, status in [(9, RED), (11, RED), (100, GREEN)]:
        (tmp_path / f"CORRECTNESS_r{rnd}.json").write_text(
            json.dumps({"q": status})
        )
    paths_lex = sorted(tmp_path.glob("CORRECTNESS_r*.json"))
    paths_num = sorted(tmp_path.glob("CORRECTNESS_r*.json"), key=_round_no)
    assert [p.name for p in paths_lex] != [p.name for p in paths_num]
    assert [_round_no(p) for p in paths_num] == [9, 11, 100]

    # numeric replay: latest draw (r100) is GREEN -> red cleared, the
    # never-drawn z leads
    rounds = [json.loads(p.read_text()) for p in paths_num]
    assert _rotation_order(["q", "z"], rounds)[0] == "z"
    # lexical replay ends on the stale r9 RED and misorders q first
    rounds_lex = [json.loads(p.read_text()) for p in paths_lex]
    assert _rotation_order(["q", "z"], rounds_lex)[0] == "q"


def test_all_names_present_exactly_once():
    names = [f"q{i}" for i in range(30)]
    rounds = [{"q0": GREEN, "q5": RED}, {"q7": GREEN}]
    order = _rotation_order(names, rounds)
    assert sorted(order) == sorted(names)


def test_every_registered_query_has_an_oracle():
    """The registry reached zero rows-only queries in round 11 (the two
    genuinely unportable kernels are unregistered, pytest-pinned
    library functions). Pin that state: a future @query registration
    without oracle SQL would silently downgrade itself to the driver's
    weaker rows-only check."""
    from hudi_utility_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, (
        f"{len(missing)} registered queries lack oracle SQL: {missing}"
    )
