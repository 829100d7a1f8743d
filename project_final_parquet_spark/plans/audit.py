"""Plan auditing: extract the scale-relevant facts from a DataFrame's
physical plan (the things SCALE.md promises — pushdown, pruning,
broadcast strategy, shuffle count) so tests and tooling can assert them
instead of eyeballing `.explain` output.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanFacts:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffled_hash_joins: int = 0
    n_nested_loop_joins: int = 0
    has_take_ordered: bool = False
    n_hash_aggregates: int = 0

    @property
    def n_joins(self) -> int:
        return (
            self.n_broadcast_joins
            + self.n_sortmerge_joins
            + self.n_shuffled_hash_joins
            + self.n_nested_loop_joins
        )


def _nodes(p: str, name: str) -> int:
    # the formatted plan lists every node exactly once as "(N) <Name>"
    return len(re.findall(rf"\(\d+\) {name}\b", p))


def plan_facts(df: DataFrame) -> PlanFacts:
    """Parse the physical plan into structured facts."""
    p = physical_plan(df)
    return PlanFacts(
        pushed_filters=[
            m.strip()
            for m in re.findall(r"PushedFilters: \[([^\]]*)\]", p)
            if m.strip()
        ],
        read_schemas=re.findall(r"ReadSchema: (struct<[^\n]*)", p),
        partition_filters=[
            m.strip()
            for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", p)
            if m.strip()
        ],
        n_exchanges=_nodes(p, "Exchange"),
        n_broadcast_joins=_nodes(p, "BroadcastHashJoin"),
        n_sortmerge_joins=_nodes(p, "SortMergeJoin"),
        n_shuffled_hash_joins=_nodes(p, "ShuffledHashJoin"),
        n_nested_loop_joins=_nodes(p, "BroadcastNestedLoopJoin")
        + _nodes(p, "CartesianProduct"),
        has_take_ordered="TakeOrderedAndProject" in p,
        n_hash_aggregates=_nodes(p, "HashAggregate"),
    )
