"""merge_into semantics: clause gating, clause order, insert defaults,
validation, MOR pre-compaction, partition scoping."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.table import KeyedTable, TableType
from hudi_utility_spark.write import merge_into, upsert


def _table(tmp_path, ttype=TableType.COPY_ON_WRITE, parts=("part",)):
    return KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["id"],
        precombine="v",
        partition_fields=list(parts),
        table_type=ttype,
    )


def _seed(spark, table):
    df = spark.createDataFrame(
        [
            (1, 10, "a", 100.0),
            (2, 10, "a", 200.0),
            (3, 10, "b", 300.0),
            (4, 10, "b", 400.0),
        ],
        "id long, v long, part string, value double",
    )
    upsert(spark, df, table)
    return df


def _snap(spark, table):
    return {
        r["id"]: (r["part"], r["value"])
        for r in table.read(spark).collect()
    }


def test_merge_delete_update_insert_in_one_pass(spark, tmp_path):
    table = _table(tmp_path)
    _seed(spark, table)
    src = spark.createDataFrame(
        [
            (1, 99, "a", 5.0),  # matched in part a -> delete_condition
            (3, 99, "b", 7.0),  # matched in part b -> update
            (9, 99, "b", 9.0),  # unmatched -> insert
        ],
        "id long, v long, part string, value double",
    )
    merge_into(
        spark,
        src,
        table,
        update_set={"value": "t.value + s.value"},
        delete_condition="t.part = 'a'",
    )
    got = _snap(spark, table)
    assert 1 not in got  # deleted
    assert got[2] == ("a", 200.0)  # matched? no — id 2 not in src; untouched
    assert got[3] == ("b", 307.0)  # updated
    assert got[4] == ("b", 400.0)  # matched-partition bystander untouched
    assert got[9] == ("b", 9.0)  # inserted


def test_merge_delete_wins_over_update(spark, tmp_path):
    # a row satisfying both predicates is deleted (clause order)
    table = _table(tmp_path)
    _seed(spark, table)
    src = spark.createDataFrame(
        [(1, 99, "a", 5.0)], "id long, v long, part string, value double"
    )
    merge_into(
        spark,
        src,
        table,
        update_set={"value": "0.0"},
        update_condition="true",
        delete_condition="true",
    )
    assert 1 not in _snap(spark, table)


def test_merge_insert_condition_and_defaults(spark, tmp_path):
    table = _table(tmp_path)
    _seed(spark, table)
    # source lacks the 'value' column entirely -> inserted as NULL
    src = spark.createDataFrame(
        [(8, 1, "a"), (9, 99, "a")], "id long, v long, part string"
    )
    merge_into(spark, src, table, insert_condition="s.v > 50")
    got = _snap(spark, table)
    assert 8 not in got  # failed insert_condition
    assert got[9] == ("a", None)  # defaulted missing column to NULL


def test_merge_insert_values_override(spark, tmp_path):
    table = _table(tmp_path)
    _seed(spark, table)
    src = spark.createDataFrame(
        [(9, 99, "a", 1.0)], "id long, v long, part string, value double"
    )
    merge_into(
        spark, src, table, insert_values={"value": "s.value * 10"}
    )
    assert _snap(spark, table)[9] == ("a", 10.0)


def test_merge_rejects_key_and_partition_assignment(spark, tmp_path):
    table = _table(tmp_path)
    _seed(spark, table)
    src = spark.createDataFrame(
        [(1, 99, "a", 1.0)], "id long, v long, part string, value double"
    )
    with pytest.raises(ValueError, match="record-key/partition"):
        merge_into(spark, src, table, update_set={"part": "'b'"})
    with pytest.raises(ValueError, match="missing required column"):
        merge_into(spark, src.drop("part"), table)


def test_merge_untouched_partition_files_not_rewritten(spark, tmp_path):
    table = _table(tmp_path)
    _seed(spark, table)
    b_dir = os.path.join(table.base_path, "part=b")
    before = {
        f: os.path.getmtime(os.path.join(b_dir, f))
        for f in os.listdir(b_dir)
        if f.endswith(".parquet")
    }
    src = spark.createDataFrame(
        [(1, 99, "a", 5.0)], "id long, v long, part string, value double"
    )
    merge_into(spark, src, table, update_set={"value": "s.value"})
    after = {
        f: os.path.getmtime(os.path.join(b_dir, f))
        for f in os.listdir(b_dir)
        if f.endswith(".parquet")
    }
    assert before == after  # partition b never read or written


def test_merge_on_mor_compacts_then_matches_cow_result(spark, tmp_path):
    mor = _table(tmp_path, ttype=TableType.MERGE_ON_READ)
    seed = _seed(spark, mor)
    # log-side churn before the merge: newer version of id 3
    upsert(
        spark,
        spark.createDataFrame(
            [(3, 20, "b", 333.0)], "id long, v long, part string, value double"
        ),
        mor,
    )
    src = spark.createDataFrame(
        [(3, 99, "b", 7.0)], "id long, v long, part string, value double"
    )
    merge_into(spark, src, mor, update_set={"value": "t.value + s.value"})
    got = _snap(spark, mor)
    assert got[3] == ("b", 340.0)  # merged against the RESOLVED snapshot
    assert not os.path.isdir(mor.log_path) or not os.listdir(mor.log_path)


def test_merge_null_condition_is_not_taken(spark, tmp_path):
    """ANSI MERGE: a WHEN clause whose predicate evaluates to NULL is
    NOT taken. A NULL delete_condition value must leave the row alone
    (the ~NULL-is-NULL filter bug silently deleted it)."""
    table = _table(tmp_path)
    _seed(spark, table)
    # id 1: value NULL via update first? Simpler: condition referencing a
    # NULL source column -> predicate is NULL for that row.
    src = spark.createDataFrame(
        [(1, 99, "a", None), (3, 99, "b", 7.0)],
        "id long, v long, part string, value double",
    )
    merge_into(
        spark,
        src,
        table,
        update_set={"value": "t.value + s.value"},
        update_condition="s.value < 100",
        delete_condition="s.value > 1000",
    )
    got = _snap(spark, table)
    # id 1: s.value is NULL -> delete gate NULL (not taken), update gate
    # NULL (not taken) -> target row untouched
    assert got[1] == ("a", 100.0)
    # id 3: delete NULL? no, 7.0 > 1000 is FALSE; update 7.0 < 100 TRUE
    assert got[3] == ("b", 307.0)


def test_merge_null_insert_condition_not_taken(spark, tmp_path):
    table = _table(tmp_path)
    _seed(spark, table)
    src = spark.createDataFrame(
        [(8, 1, "a", None), (9, 99, "a", 2.0)],
        "id long, v long, part string, value double",
    )
    merge_into(spark, src, table, insert_condition="s.value > 1")
    got = _snap(spark, table)
    assert 8 not in got  # NULL insert predicate -> not inserted
    assert got[9] == ("a", 2.0)


def test_merge_source_duplicate_keys_precombined(spark, tmp_path):
    """A source with 2 rows per key precombines (latest by the table's
    precombine field wins) instead of writing duplicate keys."""
    table = _table(tmp_path)
    _seed(spark, table)
    src = spark.createDataFrame(
        [(3, 5, "b", 1.0), (3, 50, "b", 2.0), (3, 20, "b", 3.0)],
        "id long, v long, part string, value double",
    )
    merge_into(spark, src, table, update_set={"value": "s.value"})
    rows = [r for r in table.read(spark).collect() if r["id"] == 3]
    assert len(rows) == 1
    assert rows[0]["value"] == 2.0  # v=50 row won


def test_merge_source_duplicates_without_precombine_raise(spark, tmp_path):
    table = _table(tmp_path)
    _seed(spark, table)
    src = spark.createDataFrame(
        [(3, "b", 1.0), (3, "b", 2.0)],
        "id long, part string, value double",
    )
    with pytest.raises(ValueError, match="multiple rows per record key"):
        merge_into(spark, src, table, update_set={"value": "s.value"})


def test_merge_composite_key(spark, tmp_path):
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import merge_into, upsert

    table = KeyedTable(
        path=str(tmp_path / "ck"),
        record_key=["k1", "k2"],
        precombine="v",
        partition_fields=["part"],
        table_type=TableType.COPY_ON_WRITE,
    )
    upsert(
        spark,
        spark.createDataFrame(
            [(1, "x", 1, "a", 1.0), (1, "y", 1, "a", 2.0)],
            "k1 long, k2 string, v long, part string, value double",
        ),
        table,
    )
    src = spark.createDataFrame(
        [(1, "x", 2, "a", 10.0), (2, "z", 2, "a", 3.0)],
        "k1 long, k2 string, v long, part string, value double",
    )
    merge_into(spark, src, table, update_set={"value": "s.value"})
    got = {
        (r["k1"], r["k2"]): r["value"] for r in table.read(spark).collect()
    }
    # only the FULL composite key (1,'x') matched; (1,'y') untouched
    assert got == {(1, "x"): 10.0, (1, "y"): 2.0, (2, "z"): 3.0}


def test_merge_prunes_target_scan_to_touched_partitions(spark, tmp_path, monkeypatch):
    """The target side of the merge join must scan ONLY source-touched
    partitions (partition pruning from the isin filter) — at 100 TB
    this is the difference between reading one day and the table."""
    import hudi_utility_spark.write as W

    table = _table(tmp_path)
    _seed(spark, table)
    src = spark.createDataFrame(
        [(1, 99, "a", 5.0)], "id long, v long, part string, value double"
    )

    captured = {}
    real_write = W.write_partitioned

    def spy(df, path, parts, mode="overwrite", dynamic=True):
        captured["plan"] = df._jdf.queryExecution().executedPlan().toString()
        return real_write(df, path, parts, mode=mode, dynamic=dynamic)

    monkeypatch.setattr(W, "write_partitioned", spy)
    W.merge_into(spark, src, table, update_set={"value": "s.value"})
    plan = captured["plan"]
    import re

    scans = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert scans, plan
    assert any("part" in s_ and ("a" in s_) for s_ in scans), plan
