"""events.ts physical-type robustness (ADVICE round 3).

The driver's corpus has shipped ts as TIMESTAMP(NANOS)→bigint (r1-2)
and TIMESTAMP(MICROS, NTZ) (r3+); a vanilla driver session could also
surface it as LTZ (inferTimestampNTZ disabled). ``tables.load`` must
produce the identical (ts TIMESTAMP_NTZ, ts_us epoch-micros) pair in
all cases, under ANY session timezone, and fail loudly on anything else.
"""

from __future__ import annotations

import pytest

from project_final_parquet_spark.tables import load

_ALT_TZ = "Australia/Eucla"  # +08:45 — maximally awkward offset


def _sample(spark, sf_dir):
    return sorted(
        (r.ts_us, str(r.ts))
        for r in load(spark, sf_dir, "events")
        .select("ts_us", "ts")
        .limit(200)
        .collect()
    )


def test_ltz_scan_matches_ntz_scan_any_tz(spark, sf_dir):
    """Force the LTZ arrival path via inferTimestampNTZ=false and check
    it agrees with the NTZ path bit-for-bit under a non-UTC session TZ."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    prev_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        baseline = _sample(spark, sf_dir)

        spark.conf.set("spark.sql.session.timeZone", _ALT_TZ)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = load(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        assert _sample(spark, sf_dir) == baseline
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev_ntz)


def test_unexpected_ts_dtype_raises(spark, sf_dir, tmp_path):
    """A third physical type for ts must raise, not silently mis-derive."""
    from pyspark.sql import functions as F

    bad = str(tmp_path / "sfbad")
    df = load(spark, sf_dir, "events")
    df.select("event_id", "user_id").withColumn(
        "ts", F.col("event_id").cast("double")
    ).limit(5).write.mode("overwrite").parquet(f"{bad}/events.parquet")
    with pytest.raises(TypeError, match="unsupported dtype"):
        load(spark, bad, "events")
