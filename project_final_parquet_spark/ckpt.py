"""Checkpoint lifecycle helpers for eager/iterative queries.

``df.localCheckpoint()`` persists its materialized blocks with no
owner: they survive until Python GC drops the last DataFrame reference
AND the JVM ContextCleaner gets around to them. In an iterative query
every round checkpoints a new frame, so a mixed workload accumulates
every round's blocks of every query it has run — measured: sim_pq_adc
2.0-2.7 s isolated vs 61.7 s in a plain back-to-back session where
pagerank/CC blocks from earlier queries were still resident (round-6
adjudication). The bench harness papered over this with an
unpersist-everything + System.gc() between queries, but a real cluster
running mixed workloads gets no such barrier — cleanup has to be an
ENGINE property.

These helpers make construction-time iteration self-cleaning:
``checkpoint(df)`` is ``localCheckpoint()`` plus bookkeeping of the
persistent-RDD ids the call created; ``release(frames)`` unpersists
exactly those ids. The discipline in the iterative operators is

    new = checkpoint(step(prev))   # materializes round N
    release(prev)                  # round N-1's blocks are now dead

so at any moment at most ONE round's state is resident, and after the
loop only the blocks backing the returned frame survive (released
too when the final frame no longer reads them — e.g. pagerank's edge
list once the last rank frame is materialized).

The id bookkeeping uses SparkContext.getPersistentRDDs (a public Scala
API surfaced through the Java gateway). Construction is single-
threaded per query, so the before/after id diff is exactly the blocks
the checkpoint created; if the gateway call ever fails the helpers
degrade to plain localCheckpoint semantics (blocks live until GC) —
correctness is never at stake, only memory hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_IDS_ATTR = "_spark_graft_ckpt_ids"


def _persistent_ids(spark) -> set[int]:
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(j.id()) for j in jmap.values()}
    except Exception:
        return set()


def checkpoint(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint()`` that remembers which persistent-RDD
    ids the materialization created, so ``release`` can free them
    deterministically instead of waiting for GC + ContextCleaner."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    cp = df.localCheckpoint()
    object.__setattr__(cp, _IDS_ATTR, _persistent_ids(spark) - before)
    return cp


def release(*frames: DataFrame | None) -> None:
    """Unpersist the checkpoint blocks backing ``frames`` (each one a
    ``checkpoint()`` result whose data has been superseded — folded into
    a later checkpoint or into driver state). Safe to call repeatedly;
    no-op for plain DataFrames and for frames already released."""
    for df in frames:
        if df is None:
            continue
        ids = getattr(df, _IDS_ATTR, None)
        if not ids:
            continue
        try:
            spark = df.sparkSession
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for j in jmap.values():
                if int(j.id()) in ids:
                    j.unpersist(False)
        except Exception:
            pass
        object.__setattr__(df, _IDS_ATTR, set())
