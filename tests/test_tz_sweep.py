"""Timezone-sweep determinism: the driver builds its own SparkSession
with an unknown session timezone, so every gated query must produce
identical results under radically different `spark.sql.session.timeZone`
settings. The time-math convention (integer epoch-us ts_us + NTZ
timestamps, never NTZ↔LTZ casts) is what makes this hold; this test is
the executable form of that claim for the TZ-sensitive query families."""

from __future__ import annotations

import pytest

from project_final_parquet_spark.registry import all_queries

SF = "/root/testdata/sf0.01"

# the queries whose semantics touch timestamps/dates most directly
_TZ_SENSITIVE = [
    "events_rollup_multigrain",
    "events_funnel",
    "events_cohort_retention",
    "events_transitions",
    "events_gap_fill",
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_dedup_first",
    "q17_date_funcs",
    "q57_interval_arith",
]

# +08:45, no DST neighbors at common offsets — a maximally awkward zone
_ALT_TZ = "Australia/Eucla"


def _rows(df):
    return sorted(map(tuple, (tuple(map(str, r)) for r in df.collect())))


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_query_is_timezone_invariant(spark, name):
    qs = all_queries()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = _rows(qs[name](spark, SF))
        spark.conf.set("spark.sql.session.timeZone", _ALT_TZ)
        alt = _rows(qs[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == alt
