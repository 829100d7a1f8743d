"""Event-stream operators: tumbling / sliding / session windows.

The reference is strictly batch (whole-file materialization, SURVEY.md
§2.2 — no streaming of any kind); this module supplies the streaming
surface the driver mandates, written as ONE set of transformations that
run identically under batch and Structured Streaming (the unified
Dataset semantics). The driver-gate queries run them in batch mode with
DuckDB oracles; tests/test_streaming.py runs the same transformations
under ``readStream`` with watermarks and asserts batch-equivalence.

Timezone discipline: ``F.window``/``F.session_window`` over TIMESTAMP_NTZ
aligns windows on session-local wall time, so results would depend on the
(driver-controlled, unknown) session timezone. All windowing here runs on
TIMESTAMP (LTZ) built from epoch microseconds — absolute instants with
epoch-aligned windows — and emits TZ-free epoch-microsecond boundaries.

Scale (100 TB of events): windowed aggregation shuffles once on
(window, key) with map-side partial aggregation; the watermark bounds
streaming state (late rows beyond it are dropped, state evicted);
session windows merge in the state store keyed by user — the gap
parameter is the state-size lever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import DSUM_SQL, dsum, query
from ..tables import load


# --- shared transformations (batch ≡ streaming) ----------------------------
# Contract: input carries ``ts`` as TIMESTAMP (LTZ). The batch loaders
# provide ts_us (epoch µs); _with_event_time derives the LTZ column.


def _with_event_time(events: DataFrame) -> DataFrame:
    return events.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def tumbling_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event type (epoch-aligned)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per user: start=min(ts), end=max(ts)+gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


# --- driver-gate batch queries with oracles --------------------------------

_US_30MIN = 30 * 60 * 1_000_000
_US_HOUR = 60 * 60 * 1_000_000


@query(
    "stream_tumbling_counts",
    oracle=f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {_US_HOUR} AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           {DSUM_SQL.format(expr="value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows; boundaries emitted as epoch µs (TZ-free)."""
    ev = _with_event_time(load(spark, sf_dir, "events"))
    return tumbling_counts(ev).orderBy("window_start_us", "event_type")


@query(
    "stream_sliding_counts",
    oracle=f"""
    WITH starts AS (
      SELECT value,
             epoch_us(ts) - epoch_us(ts) % {_US_30MIN} - k * {_US_30MIN}
               AS window_start_us
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offs
    )
    SELECT window_start_us, COUNT(*) AS n_events,
           {DSUM_SQL.format(expr="value")} AS sum_value
    FROM starts
    GROUP BY window_start_us
    ORDER BY window_start_us
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30min windows — every event contributes to exactly two
    windows; the oracle materializes both starts by integer arithmetic."""
    ev = _with_event_time(load(spark, sf_dir, "events"))
    return sliding_counts(ev).orderBy("window_start_us")


@query(
    "stream_session_windows",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS t, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_US_30MIN}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    numbered AS (
      SELECT user_id, t,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY t, event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(t) AS session_start_us,
           MAX(t) + {_US_30MIN} AS session_end_us,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (session_window); the oracle is the
    classic lag-gap-cumsum construction — identical session boundaries.

    Spark merges sessions with gap strictly-greater semantics (a new
    session starts when delta > gap), mirrored in the oracle."""
    ev = _with_event_time(load(spark, sf_dir, "events"))
    return session_windows(ev).orderBy("user_id", "session_start_us")


def error_rate_windows(events: DataFrame) -> DataFrame:
    """1-hour tumbling error-rate windows with an INTEGER-exact breach
    flag (4·errors > events ⇔ error rate > 25%) — the alerting shape a
    streaming health monitor emits. Works identically on a batch frame
    and a watermarked stream (same groupBy(window) plan)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_errors"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "n_errors",
            (F.lit(4) * F.col("n_errors") > F.col("n_events")).alias(
                "sla_breach"
            ),
        )
    )


@query(
    "stream_error_rate_alert",
    oracle=f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {_US_HOUR} AS window_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
           4 * SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             > COUNT(*) AS sla_breach
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def stream_error_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour error-rate alert windows (batch form of the
    streaming health monitor; tests/test_streaming.py proves the
    watermarked stream produces the identical window set). The breach
    flag is an integer cross-multiplication — no float threshold, so
    batch, stream, and oracle can never disagree at the boundary.
    events_error_rate_sla is the worst-hours TOP-K readout; this is
    the full alert series a sink would subscribe to.

    Scale: streaming state is one (window) count pair per open hour,
    watermark-evicted; batch is one map-side-combinable rollup."""
    ev = _with_event_time(load(spark, sf_dir, "events"))
    return error_rate_windows(ev).orderBy("window_start_us")


def earliest_per_key(events: DataFrame) -> DataFrame:
    """First event per (user_id, event_type) in event-time order —
    the deterministic batch form of streaming dedup
    (``dropDuplicatesWithinWatermark`` keeps the first arrival per key;
    in batch, "first" must be pinned to (ts, id) or it's
    partition-order-dependent)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts_us").alias("first_ts_us"),
            F.col("event_id").alias("first_event_id"),
            "value",
        )
    )


@query(
    "stream_dedup_first",
    oracle="""
    SELECT user_id, event_type,
           epoch_us(ts) AS first_ts_us,
           event_id AS first_event_id,
           value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ) t WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-dedup semantics in batch: keep the earliest event per
    (user, type) key. One shuffle on the dedup key; in streaming the
    same key set is exactly the state
    ``dropDuplicatesWithinWatermark`` holds until the watermark passes
    (tests/test_streaming.py exercises the stream form)."""
    ev = load(spark, sf_dir, "events")
    return earliest_per_key(ev).orderBy("user_id", "event_type")


# --- stream-static enrichment ----------------------------------------------

_US_DAY = 24 * 60 * 60 * 1_000_000


def static_enrich(events: DataFrame, dims: DataFrame) -> DataFrame:
    """Enrich the event stream with a broadcast static dimension
    (user → nation) and aggregate 1-day tumbling windows per nation.

    Stream-static joins are the canonical streaming enrichment shape:
    the static side is broadcast to every task (re-planned per
    micro-batch, so a refreshed dim table is picked up), the stream side
    never shuffles for the join, and the only stateful operator is the
    windowed aggregation. Identical code path in batch."""
    return (
        events.join(F.broadcast(dims), events["user_id"] == dims["c_custkey"])
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("n_name"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_name",
            "n_events",
            "sum_value",
        )
    )


def _nation_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return cust.join(
        nat, cust["c_nationkey"] == nat["n_nationkey"]
    ).select("c_custkey", "n_name")


@query(
    "stream_static_enrich",
    oracle=f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {_US_DAY} AS window_start_us,
           n_name,
           COUNT(*) AS n_events,
           {DSUM_SQL.format(expr="value")} AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: events enriched with the customer→nation
    dimension (broadcast, no stream-side shuffle), then 1-day tumbling
    windows per nation. tests/test_stream_static.py runs the identical
    transformation under readStream and asserts batch equivalence."""
    ev = _with_event_time(load(spark, sf_dir, "events"))
    return static_enrich(ev, _nation_dims(spark, sf_dir)).orderBy(
        "window_start_us", "n_name"
    )


# --- custom stateful operator: milestone trigger ---------------------------

_MILESTONE_EVERY = 25


@query(
    "stream_custom_state",
    oracle=f"""
    SELECT user_id, rn AS milestone, epoch_us(ts) AS ts_us FROM (
      SELECT user_id, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
    ) t
    WHERE rn % {_MILESTONE_EVERY} = 0
    ORDER BY user_id, milestone
    """,
)
def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator, batch form: per-user milestone trigger
    — emit one row each time a user's cumulative event count crosses a
    multiple of 25 (the shape of 'fire an action every Nth event', which
    windowed aggs can't express: output rows are a *subset of inputs*
    carrying running state, not one row per group/window).

    The fold runs as a partition-local stateful sweep: repartition on
    user_id co-locates each user, sortWithinPartitions makes their rows
    contiguous and time-ordered, and ONE vectorized mapInPandas pass
    computes per-user cumulative counts (groupby-cumcount), carrying the
    last user's running count across Arrow batch boundaries — the
    mapPartitions form of custom state, with none of the per-group
    pandas-frame overhead applyInPandas pays on high-cardinality keys
    (measured 10.9 s → vectorized at sf0.1). The STREAMING form of the
    identical semantics runs in tests/test_streaming.py via
    applyInPandasWithState — the running count lives in the state store
    and survives across micro-batches; the test proves stream == batch.

    Scale: one shuffle on user_id (same as any grouped agg); carry state
    per partition is a single (user, count) pair, so memory stays O(1)
    per task and the streaming state store stays O(users)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts_us", "event_id")

    def make_emit():
        # nested: cloudpickle ships by value (multimodal.make_fake_decoder)
        def emit(batches):
            import pandas as _pd

            carry_user, carry_cnt = None, 0
            for pdf in batches:
                if not len(pdf):
                    continue
                # rows arrive sorted (user_id, ts_us, event_id), so each
                # user is one contiguous run; cumcount is the within-run
                # 1-based position, plus the carry for a run that began
                # in the previous Arrow batch (only the LEADING run can
                # match carry_user — sortedness guarantees it).
                cnt = pdf.groupby("user_id", sort=False).cumcount() + 1
                if carry_user is not None:
                    cnt = cnt + (pdf["user_id"] == carry_user) * carry_cnt
                carry_user = pdf["user_id"].iloc[-1]
                carry_cnt = int(cnt.iloc[-1])
                hit = (cnt % _MILESTONE_EVERY) == 0
                yield _pd.DataFrame(
                    {
                        "user_id": pdf["user_id"][hit].astype("int64"),
                        "milestone": cnt[hit].astype("int64"),
                        "ts_us": pdf["ts_us"][hit].astype("int64"),
                    }
                )

        return emit

    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us", "event_id")
        .mapInPandas(make_emit(), "user_id long, milestone long, ts_us long")
        .orderBy("user_id", "milestone")
    )


# --- exact windowed distinct (dedup → windowed agg chain) -------------------

_US_6H = 6 * 60 * 60 * 1_000_000


def windowed_distinct_users(events: DataFrame) -> DataFrame:
    """Exact distinct users per 6-hour tumbling window, as the
    dedup→agg two-stateful-operator chain: ``dropDuplicates`` on
    (window, user) — whose state the watermark evicts once the window
    closes — feeding a windowed count. This is THE streaming shape for
    exact distinct (plain ``count_distinct`` is unsupported in
    streaming aggregation; the HLL sketch family is the approximate
    alternative at unbounded cardinality)."""
    dedup = events.select(
        F.window("ts", "6 hours").alias("w"), "user_id"
    ).dropDuplicates(["w", "user_id"])
    return (
        dedup.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_users",
        )
    )


@query(
    "stream_windowed_distinct",
    oracle=f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {_US_6H} AS window_start_us,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 6-hour tumbling window — the batch form of
    the streaming dedup→windowed-agg chain (tests/test_streaming.py
    runs the SAME transformation under readStream in append mode with
    a sentinel-advanced watermark and asserts identical rows). Exact
    distinct is a two-shuffle operation in batch ((window, user) dedup,
    then window count with map-side combine) and a two-stateful-
    operator chain in streaming; state is bounded by active users per
    open window, evicted at watermark passage.

    Scale: the dedup shuffle is the data-scale step (same key shape as
    dedup_exact); the count shuffle is |windows| rows. The HLL variant
    (events_rolling_distinct_hll) swaps in when per-window user sets
    stop fitting state."""
    ev = _with_event_time(load(spark, sf_dir, "events"))
    return windowed_distinct_users(ev).orderBy("window_start_us")


_TOPK_PER_WINDOW = 3


def topk_per_window(counts: DataFrame) -> DataFrame:
    """Top-k event types per tumbling window, ranked by count with the
    event_type tiebreak — a pure READOUT over the tumbling_counts
    frame (batch or the drained streaming sink alike): the stateful
    part of windowed top-k is just the windowed count; the rank never
    needs to live in streaming state."""
    from pyspark.sql import Window as W

    w_rank = W.partitionBy("window_start_us").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        counts.select(
            "window_start_us",
            "event_type",
            "n_events",
            F.row_number().over(w_rank).alias("rank"),
        )
        .filter(F.col("rank") <= _TOPK_PER_WINDOW)
        .orderBy("window_start_us", "rank")
    )


@query(
    "stream_topk_per_window",
    oracle=f"""
    WITH counts AS (
      SELECT epoch_us(ts) - epoch_us(ts) % {_US_HOUR} AS window_start_us,
             event_type, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT window_start_us, event_type, n_events,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY window_start_us
               ORDER BY n_events DESC, event_type) AS BIGINT) AS rank
      FROM counts
    )
    SELECT window_start_us, event_type, n_events, rank
    FROM ranked WHERE rank <= {_TOPK_PER_WINDOW}
    ORDER BY window_start_us, rank
    """,
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items per hour: the top-{_TOPK_PER_WINDOW} event types
    of every tumbling 1-hour window (count-ranked, event_type
    tiebreak). The streaming decomposition is the point: the ONLY
    stateful stage is the per-(window, type) count tumbling_counts
    already maintains (watermark-evicted, one row per open pair); the
    rank is a stateless readout applied to each emitted window —
    tests/test_streaming.py proves the drained stream + readout equals
    this batch form row-for-row.

    Scale: the count is map-side combinable into |windows|·|types|
    state rows; the rank partitions by window over that already-small
    frame. Nothing ranks raw events."""
    ev = _with_event_time(load(spark, sf_dir, "events"))
    counts = tumbling_counts(ev).select(
        "window_start_us", "event_type", "n_events"
    )
    return topk_per_window(counts)


def session_abandonment(events: DataFrame) -> DataFrame:
    """Per-user gap sessions with a purchase flag — the stateful stage
    (one session_window aggregate; batch ≡ stream). The hourly
    abandonment readout below is stateless over this frame."""
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_purchases"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "n_purchases",
        )
    )


def abandonment_by_hour(sessions: DataFrame) -> DataFrame:
    """Stateless hourly readout over the session frame."""
    aband = F.sum(F.when(F.col("n_purchases") == 0, 1).otherwise(0))
    return (
        sessions.groupBy(
            (
                F.col("session_start_us")
                - F.col("session_start_us") % _US_HOUR
            ).alias("hour_start_us")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            aband.cast("long").alias("n_abandoned"),
            (aband.cast("double") / F.count(F.lit(1))).alias(
                "abandonment_rate"
            ),
        )
        .orderBy("hour_start_us")
    )


@query(
    "stream_session_abandonment",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS t, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_US_30MIN}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    numbered AS (
      SELECT user_id, t, pur,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY t, event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, MIN(t) AS s, CAST(SUM(pur) AS BIGINT) AS n_pur
      FROM numbered GROUP BY user_id, sid
    )
    SELECT s - s % {_US_HOUR} AS hour_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_pur = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_abandoned,
           CAST(SUM(CASE WHEN n_pur = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS abandonment_rate
    FROM sessions
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_session_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session abandonment by hour: gap sessions (the session_window
    stage stream_session_windows already proves batch ≡ stream) carry a
    purchase count; sessions with zero purchases are abandoned, rolled
    up by session-start hour — the funnel-health series a commerce team
    alerts on. Streaming decomposition: the ONLY stateful stage is the
    per-(user, session) aggregate (watermark-evicted); the hourly
    abandonment rollup is a stateless readout over emitted sessions
    (tests prove the drained stream + readout equals this batch form).

    Scale: one session_window aggregate keyed by user (state = open
    sessions only), then an |hours|-key map-side rollup."""
    ev = _with_event_time(load(spark, sf_dir, "events"))
    return abandonment_by_hour(session_abandonment(ev))
