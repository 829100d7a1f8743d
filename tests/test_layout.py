"""Data-layout tests: sorted parquet writes produce tight per-row-group
min/max statistics — the prerequisite for row-group skipping, which at
100 TB is the difference between scanning a date-filtered table and
scanning 1/N of it. Verified against the actual parquet footer metadata
(pyarrow), not just the plan."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from project_final_parquet_spark.tables import load

SF = "/root/testdata/sf0.01"


def _shipdate_spans(path: str):
    """Per-row-group (min, max) l_shipdate spans across all files."""
    import glob
    import os

    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                if col.path_in_schema == "l_shipdate" and col.statistics:
                    spans.append(
                        (col.statistics.min, col.statistics.max)
                    )
    return spans


def test_sorted_layout_tightens_rowgroup_stats(spark, tmp_path):
    """Writing sorted by the filter column shrinks every row group's
    min/max span to a small slice of the global range; an unsorted
    write leaves (nearly) the global range in every row group, making
    min/max skipping useless. This is the Z-order/cluster-by argument
    in its 1-D form."""
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    sorted_dir = str(tmp_path / "sorted")
    unsorted_dir = str(tmp_path / "unsorted")
    # force multiple row groups per file via small page/rowgroup budget
    (
        li.repartition(2)
        .sortWithinPartitions("l_shipdate")
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(sorted_dir)
    )
    li.repartition(2).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(unsorted_dir)

    def spanset(path):
        spans = _shipdate_spans(path)
        assert spans, "expected row-group statistics"
        return spans

    s_spans = spanset(sorted_dir)
    u_spans = spanset(unsorted_dir)
    glb = (
        min(a for a, _ in u_spans),
        max(b for _, b in u_spans),
    )
    global_days = (glb[1] - glb[0]).days or 1

    def mean_span_days(spans):
        return sum((b - a).days for a, b in spans) / len(spans)

    # sorted row groups each cover a small slice; unsorted cover ~all
    assert len(s_spans) > 2
    assert mean_span_days(s_spans) < 0.5 * global_days
    assert mean_span_days(u_spans) > 0.8 * global_days
    assert mean_span_days(s_spans) < 0.25 * mean_span_days(u_spans)


def test_spark_prunes_sorted_rowgroups(spark, tmp_path):
    """End-to-end: a selective date filter over the sorted layout
    returns the same result as over the unsorted one (skipping is a
    pure optimization), and the pushed filter reaches the scan."""
    from project_final_parquet_spark.plans import plan_facts

    li = load(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    sorted_dir = str(tmp_path / "sorted2")
    (
        li.repartition(2)
        .sortWithinPartitions("l_shipdate")
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(sorted_dir)
    )
    cutoff = "1995-06-17"
    pred = F.col("l_shipdate") < F.lit(cutoff).cast("timestamp_ntz")
    got = spark.read.parquet(sorted_dir).filter(pred)
    f = plan_facts(got)
    assert any("l_shipdate" in x for x in f.pushed_filters)
    assert got.count() == li.filter(pred).count()
