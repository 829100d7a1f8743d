"""Driver-gated Python UDTF: the table-valued-function surface proven
under the correctness gate (tests/test_udtf.py covers the API shape;
this makes it an oracle-checked query).

The UDTF class is defined INSIDE the query function so cloudpickle
serializes it by value — a module-level class would pickle by
reference and fail to import on executors when the driver runs from an
arbitrary cwd (same rule as every worker-side function in this repo).

Scale: a row UDTF is the slowest UDF tier (per-row Python, no Arrow
batching) — kept for API completeness and gated on a 5-document slice;
the production paths for this exact job are F.posexplode (pure JVM,
what the oracle models) or an arrow-batched mapInPandas/mapInArrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import load


@query(
    "udtf_token_positions",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 5
    )
    SELECT t.doc_id, CAST(u.i AS INT) AS pos, t.toks[u.i + 1] AS token
    FROM t, LATERAL (SELECT unnest(range(len(t.toks))) AS i) u
    ORDER BY t.doc_id, pos
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize 5 documents through a Python UDTF applied with LATERAL
    — each input row expands to (pos, token) rows, joined back to the
    outer row's doc_id. Equivalent JVM form is posexplode(split(...)),
    which the DuckDB oracle mirrors."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class TokenPositions:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("udtf_token_positions_fn", TokenPositions)
    load(spark, sf_dir, "documents").filter("doc_id < 5").select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT doc_id, pos, token
        FROM udtf_docs_v, LATERAL udtf_token_positions_fn(text)
        ORDER BY doc_id, pos
        """
    )
