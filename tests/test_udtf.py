"""Python UDTF surface (Spark 3.5+): table-valued function over rows."""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


def test_udtf_lateral_expansion(spark):
    @udtf(returnType="piece: string, idx: int")
    class Splitter:
        def eval(self, text: str, sep: str):
            for i, piece in enumerate(text.split(sep)):
                yield piece, i

    Splitter_registered = spark.udtf.register("split_pieces", Splitter)
    rows = spark.sql(
        "SELECT * FROM split_pieces('a b c', ' ')"
    ).collect()
    assert [(r.piece, r.idx) for r in rows] == [("a", 0), ("b", 1), ("c", 2)]

    # lateral join against a table
    spark.createDataFrame(
        [("x y", 1), ("z", 2)], "s string, k int"
    ).createOrReplaceTempView("udtf_src")
    got = spark.sql(
        "SELECT k, piece FROM udtf_src, LATERAL split_pieces(s, ' ')"
    ).collect()
    assert sorted((r.k, r.piece) for r in got) == [(1, "x"), (1, "y"), (2, "z")]
