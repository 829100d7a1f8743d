"""Round-8 lake-tier regression tests: the DV write path rework and
the four advisor findings.

1. `delete_where_dv` is ONE stats-pruned job over all touched files
   (no per-file driver loop), and a SECOND delete touching an
   already-DV-carrying file MERGES the old sidecar keys instead of
   overwriting them (the resurrection bug).
2. `read()` applies each sidecar to ITS OWN file only, so with a
   non-unique key column the merge-on-read view and the
   post-compaction view of the same table agree.
3. `add_blooms` survives NULL keys (filtered before hashing,
   `has_nulls` recorded) and rejects non-integral key columns loudly.
4. `read_bloom_pruned`'s proven-absent empty frame carries the SAME
   merged schema as every other read path after schema evolution.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from project_final_parquet_spark.lake import LakeTable


def _stage(spark, root, n=60, files=2):
    table = LakeTable(root)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 13 % 101).alias("v"),
    )
    table.commit_append(
        df.filter(F.col("k") < n // 2),
        stats_cols=("k",),
        num_files=files,
        range_by="k",
    )
    table.commit_append(
        df.filter(F.col("k") >= n // 2),
        stats_cols=("k",),
        num_files=files,
        range_by="k",
    )
    return table


def test_repeat_dv_delete_merges_sidecars(spark, tmp_path):
    """Second DV delete on a file already carrying a DV must UNION the
    old keys — the first commit's deletions must not resurrect."""
    table = _stage(spark, tmp_path / "t")
    v1 = table.delete_where_dv(
        spark, col="k", lo=0, hi=10, predicate=F.col("k") < 10, key_col="k"
    )
    v2 = table.delete_where_dv(
        spark,
        col="k",
        lo=10,
        hi=20,
        predicate=(F.col("k") >= 10) & (F.col("k") < 20),
        key_col="k",
    )
    got = sorted(r.k for r in table.read(spark, version=v2).collect())
    assert got == list(range(20, 60)), "first delete's rows resurrected"
    # the merged sidecar literally contains both key sets
    dv_entries = [e for e in table.manifest(v2) if e.dv]
    all_keys = set()
    for e in dv_entries:
        all_keys |= set(json.loads(Path(e.dv).read_text())["keys"])
    assert all_keys == set(range(20))
    # v1 snapshot is unchanged (time travel)
    assert sorted(r.k for r in table.read(spark, version=v1).collect()) == list(
        range(10, 60)
    )
    # compaction converges to the same view
    vc = table.compact_dv(spark, stats_cols=("k",))
    assert sorted(r.k for r in table.read(spark, version=vc).collect()) == list(
        range(20, 60)
    )


def test_dv_key_col_mismatch_is_loud(spark, tmp_path):
    table = _stage(spark, tmp_path / "t")
    table.delete_where_dv(
        spark, col="k", lo=0, hi=5, predicate=F.col("k") < 5, key_col="k"
    )
    with pytest.raises(ValueError, match="key column mismatch"):
        table.delete_where_dv(
            spark,
            col="k",
            lo=0,
            hi=60,
            predicate=F.col("grp") == 3,
            key_col="grp",
        )


def test_dv_cap_error_still_fires(spark, tmp_path):
    table = _stage(spark, tmp_path / "t")
    old_cap = LakeTable.DV_MAX_KEYS
    LakeTable.DV_MAX_KEYS = 5
    try:
        with pytest.raises(ValueError, match="delete_where"):
            table.delete_where_dv(
                spark,
                col="k",
                lo=0,
                hi=60,
                predicate=F.col("k") >= 0,
                key_col="k",
            )
    finally:
        LakeTable.DV_MAX_KEYS = old_cap


def test_dv_non_unique_key_is_file_scoped(spark, tmp_path):
    """With a NON-unique key column, a key deleted from file A must
    not drop matching rows in file B: read() (merge-on-read) and
    compact_dv() (rewrite) must present the same table."""
    table = LakeTable(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),  # non-unique across files
    )
    table.commit_append(
        df.filter(F.col("k") < 20), stats_cols=("k",), num_files=1
    )
    table.commit_append(
        df.filter(F.col("k") >= 20), stats_cols=("k",), num_files=1
    )
    # delete grp==2 rows ONLY where k<20 → stats prune to file 1; the
    # sidecar must not leak into file 2's grp==2 rows
    v = table.delete_where_dv(
        spark,
        col="k",
        lo=0,
        hi=20,
        predicate=(F.col("grp") == 2) & (F.col("k") < 20),
        key_col="grp",
    )
    mor = sorted(r.k for r in table.read(spark, version=v).collect())
    expect = sorted(
        r.k
        for r in df.filter(
            ~((F.col("grp") == 2) & (F.col("k") < 20))
        ).collect()
    )
    assert mor == expect, "read() dropped rows outside the DV's file"
    vc = table.compact_dv(spark, stats_cols=("k",))
    cow = sorted(r.k for r in table.read(spark, version=vc).collect())
    assert cow == mor, "MOR and compacted views diverge"


def test_add_blooms_handles_nulls_and_prunes(spark, tmp_path):
    table = LakeTable(tmp_path / "t")
    df = spark.range(30).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    table.commit_append(df.filter(F.col("v") < 15), num_files=1)
    table.commit_append(df.filter(F.col("v") >= 15), num_files=1)
    v = table.add_blooms(spark, "k")  # must not raise on NULL keys
    sidecars = [
        json.loads(Path(e.stats["__bloom__k"][0]).read_text())
        for e in table.manifest(v)
    ]
    assert all(s["has_nulls"] for s in sidecars)
    # present key: superset guarantee (file containing it is kept)
    hit, n_read, n_total = table.read_bloom_pruned(spark, "k", 7)
    assert hit.filter(F.col("k") == 7).count() == 1
    # absent key beyond the domain: usually prunes everything; always
    # a correct superset
    miss, m_read, m_total = table.read_bloom_pruned(spark, "k", 10**6)
    assert miss.filter(F.col("k") == 10**6).count() == 0


def test_add_blooms_rejects_non_integral_key(spark, tmp_path):
    table = LakeTable(tmp_path / "t")
    df = spark.range(10).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    table.commit_append(df, num_files=1)
    with pytest.raises(ValueError, match="integral"):
        table.add_blooms(spark, "k")


def _grouped_jobs(spark, group: str, fn) -> int:
    """Run ``fn`` under a dedicated job group and return how many jobs
    IT launched — immune to stray jobs from other tests/fixtures that
    polluted the old all-session count under the full suite."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_dv_write_path_job_count_is_constant_in_file_count(
    spark, tmp_path
):
    """The r7 VERDICT finding: delete_where_dv used to launch one
    Spark job PER touched file from a driver loop. The rework is one
    stats-pruned scan grouped by input_file_name() — the number of
    jobs must be the SAME whether the predicate touches 2 files or 8
    (and likewise for compact_dv's single rewrite job)."""
    deltas = {}
    compact_deltas = {}
    for files in (2, 8):
        table = _stage(spark, tmp_path / f"t{files}", files=files)
        pred = F.col("k") % 3 == 0  # touches every file
        deltas[files] = _grouped_jobs(
            spark,
            f"dv_del_{files}",
            lambda: table.delete_where_dv(
                spark, col="k", lo=0, hi=60, predicate=pred, key_col="k"
            ),
        )
        compact_deltas[files] = _grouped_jobs(
            spark,
            f"dv_cmp_{files}",
            lambda: table.compact_dv(spark, stats_cols=("k",)),
        )
    assert deltas[2] == deltas[8], deltas
    assert compact_deltas[2] == compact_deltas[8], compact_deltas
    # r10: pin the absolute ceiling too — the delete path is exactly
    # the count-only validation scan plus the bounded collecting scan
    # (two collects; AQE splits each into up to 3 jobs: shuffle map,
    # re-optimized reduce, result). Measured 6 at both file counts; a
    # regression to a per-file loop would scale with `files` and blow
    # well past this at 8.
    assert deltas[8] <= 6, deltas


def test_bloom_pruned_empty_frame_has_evolved_schema(spark, tmp_path):
    """After schema evolution, the proven-absent empty result must
    carry the merged schema (including columns added later), exactly
    like the non-pruned read paths."""
    table = LakeTable(tmp_path / "t")
    table.commit_append(
        spark.range(5).select(F.col("id").alias("k")), num_files=1
    )
    table.commit_append(
        spark.range(5, 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
        ),
        num_files=1,
    )
    table.add_blooms(spark, "k")
    df, n_read, n_total = table.read_bloom_pruned(spark, "k", 10**9)
    if n_read == 0:
        assert set(df.columns) == {"k", "extra"}
        assert df.count() == 0
    else:  # hash collision kept a file: still a correct superset
        assert df.filter(F.col("k") == 10**9).count() == 0


def test_dv_paths_with_spaces_survive_file_grouping(spark, tmp_path):
    """input_file_name() returns a URI with %20 for spaces; the
    _FILE_EXPR normalization must map it back to the manifest's plain
    path or the per-file key grouping silently drops every match."""
    root = tmp_path / "lake with spaces" / "t"
    table = _stage(spark, root)
    v = table.delete_where_dv(
        spark, col="k", lo=0, hi=10, predicate=F.col("k") < 10, key_col="k"
    )
    assert v > 2, "no sidecar written — file grouping lost the paths"
    got = sorted(r.k for r in table.read(spark, version=v).collect())
    assert got == list(range(10, 60))
    vc = table.compact_dv(spark, stats_cols=("k",))
    assert sorted(r.k for r in table.read(spark, version=vc).collect()) == list(
        range(10, 60)
    )


def test_vacuum_plan_matches_actual_vacuum(spark, tmp_path):
    """The dry-run plan must predict exactly what vacuum() then
    deletes (file count per added-version), and the retained snapshot
    must read identically afterwards."""
    table = _stage(spark, tmp_path / "t")  # v1, v2 appends
    # v3: rewrite everything so v1+v2 files become reclaimable
    table.replace_where(
        spark,
        "k",
        -1,
        10**9,
        table.read(spark).withColumn("v", F.col("v") + 1),
        stats_cols=("k",),
        expected_parent=2,
    )
    before = sorted(
        (r.k, r.grp, r.v) for r in table.read(spark).collect()
    )
    plan = table.vacuum_plan(retain_last=1)
    assert {p[0] for p in plan} == {1, 2}
    assert sum(p[1] for p in plan) > 0
    deleted = table.vacuum(retain_last=1)
    assert len(deleted) == sum(p[1] for p in plan)
    after = sorted((r.k, r.grp, r.v) for r in table.read(spark).collect())
    assert after == before


def test_overlapping_pruning_is_shared_and_exact(spark, tmp_path):
    """Round-11 pin (VERDICT r10 item 6): every predicate-ranged path —
    delete_where_dv's guard + collecting scans included — derives its
    file set from the single `_overlapping` helper, and that helper
    prunes exactly by manifest min/max with missing-stats entries kept.
    The behavioral half: a DV delete whose range excludes a file must
    leave that file without a sidecar (its bytes were never needed)."""
    from datetime import date

    from project_final_parquet_spark.lake.table import (
        FileEntry,
        _overlapping,
    )

    def fe(path, stats):
        return FileEntry(path=path, rows=1, stats=stats, added=1)

    entries = [
        fe("a", {"k": [0, 9]}),
        fe("b", {"k": [10, 19]}),
        fe("c", {}),  # pre-evolution file: no stats -> kept
        fe("d", {"k": [20, 29]}),
    ]
    got = [e.path for e in _overlapping(entries, "k", 10, 20)]
    assert got == ["b", "c"]  # half-open [10, 20): d's min 20 excluded
    # temporal stats prune through the ISO serializer
    t = [fe("x", {"d": ["2024-01-01", "2024-06-30"]})]
    assert _overlapping(t, "d", date(2024, 7, 1), date(2024, 12, 31)) == []
    assert len(_overlapping(t, "d", date(2024, 6, 30), date(2024, 7, 2))) == 1

    # behavioral: the excluded file never gains a DV sidecar
    table = _stage(spark, tmp_path / "t")
    v = table.delete_where_dv(
        spark, "k", 0, 10, F.col("k") < 5, key_col="k"
    )
    by_path = {e.path: e for e in table.manifest(v)}
    dv_files = [p for p, e in by_path.items() if e.dv]
    assert len(dv_files) == 1  # only the first range file of commit 1
    # every file whose k-range is outside [0, 10) stayed sidecar-free
    for p, e in by_path.items():
        if e.stats.get("k") and e.stats["k"][0] >= 10:
            assert not e.dv, p
