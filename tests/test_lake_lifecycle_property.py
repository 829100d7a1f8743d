"""Model-based lifecycle test for the lake DML surface.

Random (seeded, reproducible) sequences of append / merge_upsert /
delete_where / replace_where / compact / vacuum run against BOTH the
LakeTable and a plain Python dict model; after every operation the
table's full contents must equal the model exactly. This is the
whole-surface interaction check the per-op tests can't give: e.g.
a merge after a compaction after a delete must still see exactly the
surviving keys, and vacuum must never reclaim a file the current
snapshot references.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from project_final_parquet_spark.lake import LakeTable

KEYSPACE = 600  # established keys 0..599
NEW_POOL = range(10_000, 10_600)  # insert keys drawn here
N_OPS = 8


def _df(spark, items):
    return spark.createDataFrame(
        [(int(k), float(v)) for k, v in items], "k long, v double"
    )


def _read_state(spark, table) -> dict[int, float]:
    return {
        r.k: r.v for r in table.read(spark).select("k", "v").collect()
    }


@pytest.mark.parametrize("seed", [7, 21])
def test_random_lifecycle_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    table = LakeTable(tmp_path / f"t{seed}")
    model: dict[int, float] = {k: float(k) for k in range(KEYSPACE)}
    table.commit_append(
        _df(spark, model.items()),
        stats_cols=("k",),
        num_files=4,
        range_by="k",
    )
    new_keys = iter(NEW_POOL)

    for step in range(N_OPS):
        op = rng.choice(
            ["append", "merge", "delete", "replace", "compact", "vacuum"]
        )
        if op == "append":
            batch = {next(new_keys): rng.uniform(0, 100) for _ in range(20)}
            model.update(batch)
            table.commit_append(
                _df(spark, batch.items()), stats_cols=("k",)
            )
        elif op == "merge":
            lo = rng.randrange(0, KEYSPACE)
            upd = {
                k: round(rng.uniform(0, 100), 3)
                for k in model
                if lo <= k < lo + 80
            }
            ins = {next(new_keys): 1.0 for _ in range(5)}
            batch = {**upd, **ins}
            if not batch:
                continue
            model.update(batch)
            table.merge_upsert(
                spark, _df(spark, batch.items()), "k", stats_cols=("k",)
            )
        elif op == "delete":
            lo = rng.randrange(0, KEYSPACE)
            hi = lo + rng.randrange(10, 60)
            doomed = [k for k in model if lo <= k < hi]
            if not doomed:
                continue
            for k in doomed:
                del model[k]
            table.delete_where(
                spark,
                "k",
                lo,
                hi,
                (F.col("k") >= lo) & (F.col("k") < hi),
                stats_cols=("k",),
            )
        elif op == "replace":
            lo = rng.randrange(0, KEYSPACE)
            hi = lo + 40
            in_range = [k for k in model if lo <= k < hi]
            restated = {k: -float(step + 1) for k in in_range[::2]}
            for k in in_range:
                model.pop(k)
            model.update(restated)
            table.replace_where(
                spark,
                "k",
                lo,
                hi,
                _df(spark, restated.items()),
                stats_cols=("k",),
            )
        elif op == "compact":
            table.compact(spark, target_bytes=1 << 20, stats_cols=("k",))
        elif op == "vacuum":
            table.vacuum(retain_last=1)

        got = _read_state(spark, table)
        assert got == model, (
            f"seed={seed} step={step} op={op}: table diverged from model "
            f"(missing={sorted(set(model) - set(got))[:5]}, "
            f"extra={sorted(set(got) - set(model))[:5]})"
        )

    # end-to-end: vacuum to one snapshot, read must still equal model
    table.vacuum(retain_last=1)
    assert _read_state(spark, table) == model


@pytest.mark.parametrize("seed", [11])
def test_change_feed_matches_model_diff(spark, tmp_path, seed):
    """CDF under the same random-lifecycle model: for sampled version
    pairs (u, w), change_feed(u→w) must equal the model-snapshot diff —
    exact keys, exact classes, exact row images (new image for
    insert/update_post, old image for delete). Compaction commits in
    the range must not leak phantom changes."""
    rng = random.Random(seed)
    table = LakeTable(tmp_path / f"cdf{seed}")
    model: dict[int, float] = {k: float(k) for k in range(KEYSPACE)}
    table.commit_append(
        _df(spark, model.items()), stats_cols=("k",), num_files=4,
        range_by="k",
    )
    snaps: dict[int, dict[int, float]] = {1: dict(model)}
    new_keys = iter(NEW_POOL)

    for step in range(N_OPS):
        op = rng.choice(["append", "merge", "delete", "replace", "compact"])
        if op == "append":
            batch = {next(new_keys): rng.uniform(0, 100) for _ in range(20)}
            model.update(batch)
            table.commit_append(_df(spark, batch.items()), stats_cols=("k",))
        elif op == "merge":
            lo = rng.randrange(0, KEYSPACE)
            upd = {
                k: round(rng.uniform(0, 100), 3)
                for k in model
                if lo <= k < lo + 80
            }
            ins = {next(new_keys): 1.0 for _ in range(5)}
            batch = {**upd, **ins}
            model.update(batch)
            table.merge_upsert(
                spark, _df(spark, batch.items()), "k", stats_cols=("k",)
            )
        elif op == "delete":
            lo = rng.randrange(0, KEYSPACE)
            hi = lo + rng.randrange(10, 60)
            doomed = [k for k in model if lo <= k < hi]
            if not doomed:
                continue
            for k in doomed:
                del model[k]
            table.delete_where(
                spark, "k", lo, hi,
                (F.col("k") >= lo) & (F.col("k") < hi), stats_cols=("k",),
            )
        elif op == "replace":
            lo = rng.randrange(0, KEYSPACE)
            hi = lo + 40
            in_range = [k for k in model if lo <= k < hi]
            restated = {k: -float(step + 1) for k in in_range[::2]}
            for k in in_range:
                model.pop(k)
            model.update(restated)
            table.replace_where(
                spark, "k", lo, hi, _df(spark, restated.items()),
                stats_cols=("k",),
            )
        elif op == "compact":
            table.compact(spark, target_bytes=1 << 20, stats_cols=("k",))
        snaps[table.current_version] = dict(model)

    versions = sorted(snaps)
    pairs = [(u, w) for u in versions for w in versions if u < w]
    for u, w in rng.sample(pairs, min(8, len(pairs))):
        old, new = snaps[u], snaps[w]
        expected: dict[int, tuple[str, float]] = {}
        for k in old.keys() - new.keys():
            expected[k] = ("delete", old[k])
        for k in new.keys() - old.keys():
            expected[k] = ("insert", new[k])
        for k in old.keys() & new.keys():
            if old[k] != new[k]:
                expected[k] = ("update_post", new[k])
        got = {
            r.k: (r._change_type, r.v)
            for r in table.change_feed(
                spark, "k", since_version=u, to_version=w
            ).collect()
        }
        assert got == expected, f"CDF v{u}->v{w} diverged from model diff"
