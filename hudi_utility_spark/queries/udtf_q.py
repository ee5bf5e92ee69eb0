"""Python UDTF entry of the UDF-surface matrix (SURVEY §2.10).

Sixth row of the matrix (scalar / grouped-agg / grouped-map /
mapInPandas / applyInPandasWithState / **table function**): a Spark 4
Python UDTF used through a SQL ``LATERAL`` join. The demo kernel is a
single-pass run-length scanner — the one shape where an imperative
per-row generator genuinely beats the declarative plan (the SQL
equivalent is two windows plus a group-by: three shuffles; the UDTF
does it in one pass inside the row it already holds).

Policy note: this is the *declared* slow-path entry of the matrix —
row-bounded (one doc per eval, docs are small), Arrow-batched
(``useArrow=True``), and never on the hot path; the engine's chunking /
n-gram operators stay on built-in HOFs (``ops/text.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from hudi_utility_spark.queries import query
from hudi_utility_spark.tables import load_table


@udtf(returnType="word: string, start_pos: int, run_len: int", useArrow=True)
class WordRuns:
    """Emit every maximal run of >=2 consecutive identical whitespace
    tokens as (word, start_pos, run_len)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if not text:
            return
        toks = text.split(" ")
        run_start = 0
        for i in range(1, len(toks) + 1):
            if i == len(toks) or toks[i] != toks[run_start]:
                if i - run_start >= 2:
                    yield toks[run_start], run_start, i - run_start
                run_start = i


@query(
    "udtf_word_runs",
    """
    WITH toks AS (
      SELECT doc_id, gs-1 AS pos, parts[gs] AS w
      FROM (SELECT doc_id, string_split(text,' ') AS parts
            FROM documents WHERE doc_id < 200),
           UNNEST(generate_series(1, len(parts))) AS t(gs)
    ), marked AS (
      SELECT *, CASE WHEN lag(w) OVER (PARTITION BY doc_id ORDER BY pos) = w
                     THEN 0 ELSE 1 END AS brk
      FROM toks
    ), grp AS (
      SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM marked
    )
    SELECT doc_id, w AS word, CAST(MIN(pos) AS INT) AS start_pos,
           CAST(COUNT(*) AS INT) AS run_len
    FROM grp GROUP BY doc_id, w, g HAVING COUNT(*) >= 2
    """,
)
def udtf_word_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length scan through a LATERAL Python UDTF; the DuckDB oracle
    is the declarative twin (gaps-and-islands over two windows)."""
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 200")
    spark.udtf.register("word_runs", WordRuns)
    d.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, wr.word, wr.start_pos, wr.run_len
        FROM _udtf_docs d, LATERAL word_runs(d.text) wr
        """
    )
