"""Snapshot-log table layer (mini-lakehouse) over parquet.

Versioned commits, time-travel reads, incremental (CDC-style) scans,
and manifest-stats file pruning — the storage features the streaming/
CDC operator family (upsert_snapshot, cdc_merge_on_read, snapshot_diff,
layout_compaction_plan) assumes a table format provides. Implemented
from the PUBLIC design shared by Delta Lake / Apache Iceberg
(an append-only JSON log of file manifests with min/max column stats);
no code from either project.
"""

from .feed import LakeFeedDataSource, register_lakefeed
from .table import LakeTable, CommitConflict

__all__ = [
    "LakeTable",
    "CommitConflict",
    "LakeFeedDataSource",
    "register_lakefeed",
]
