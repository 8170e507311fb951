"""Streaming queries for the driver contract: each drives a finite
file-stream to completion (memory sink, complete/update mode) and
returns the materialized DataFrame — so windowed results ARE
oracle-checkable against batch time-bucket SQL (the gate the reference
never had: its pipeline is batch-only).

Oracle notes: Spark tumbling windows align to the Unix epoch in the
UTC session timezone → window_start = floor(epoch/len)·len, which
DuckDB reproduces with make_timestamp(); session windows use the
gaps-and-islands rewrite (new session when the gap ≥ the timeout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from threat_detection_nosql_spark.streaming import stream_queries as S

_EVENTS_CTE = """
WITH ev AS (
  SELECT user_id AS user, ts,
         CASE WHEN hour(ts) < 8 OR hour(ts) > 18 THEN 1 ELSE 0 END
           AS is_after_hours,
         event_type AS activity
  FROM events
)
"""


def stream_windowed_user_counts(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    return S.windowed_user_counts(spark, sf_dir)


_WINDOWED_SQL = _EVENTS_CTE + """
SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                      * 1000000) AS window_start,
       user,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_after_hours) AS BIGINT) AS n_after_hours
FROM ev
GROUP BY 1, 2
"""


def stream_sliding_type_counts(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    return S.sliding_type_counts(spark, sf_dir)


_SLIDING_SQL = _EVENTS_CTE + """
, slid AS (
  SELECT activity,
         make_timestamp((CAST(floor(epoch(ts) / 3600) AS BIGINT) - off)
                        * 3600 * 1000000) AS window_start
  FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS off) o
)
SELECT window_start,
       window_start + INTERVAL '2 hours' AS window_end,
       activity,
       CAST(count(*) AS BIGINT) AS n_events
FROM slid
GROUP BY window_start, activity
"""


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.session_windows_per_user(spark, sf_dir)


_SESSION_SQL = _EVENTS_CTE + """
, marked AS (
  SELECT user, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user ORDER BY ts)
),
sessions AS (
  SELECT user, ts,
         sum(new_session) OVER (PARTITION BY user ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       user,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user, sid
"""


def stream_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.streaming_anomaly_flags(spark, sf_dir, threshold=3)


_ANOMALY_FLAGS_SQL = _EVENTS_CTE + """
SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                      * 1000000) AS window_start,
       user,
       CAST(count(*) AS BIGINT) AS n_after_hours
FROM ev
WHERE is_after_hours = 1
GROUP BY 1, 2
HAVING count(*) >= 3
"""


def stream_stateful_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running profile, deduped to each user's
    final emitted row — counts are monotone in batch order, so the
    post-drain state equals the batch aggregate and the custom
    stateful operator is fully oracle-checkable (the ratio is one
    exact integer division, IEEE-identical in both engines)."""
    return S.stateful_user_profiles(spark, sf_dir)


_STATEFUL_PROFILES_SQL = _EVENTS_CTE + """
, we AS (
  SELECT user, is_after_hours,
         CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS is_weekend
  FROM ev
)
SELECT user,
       CAST(count(*) AS BIGINT) AS total_activities,
       CAST(sum(is_after_hours) AS BIGINT) AS after_hours_activities,
       CAST(sum(is_weekend) AS BIGINT) AS weekend_activities,
       sum(is_after_hours) * 1.0 / count(*) AS after_hours_ratio
FROM we GROUP BY user
"""


def _tws_available() -> bool:
    """transformWithStateInPandas speaks protobuf to its state server;
    the runtime gate keeps the query registry importable in containers
    without a working google.protobuf (this one: `cannot import name
    'descriptor'`). The operator itself (streaming/stream_queries.
    tws_user_profiles) is complete and oracle-checkable wherever
    protobuf works."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def stream_tws_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 transformWithState (RocksDB state store) running
    per-user profile; the post-drain state equals the batch aggregate,
    so this custom stateful operator IS oracle-checkable.

    Environment-independent registration (round-10): where
    google.protobuf is importable the query runs the real
    transformWithStateInPandas operator; elsewhere it computes the
    SAME post-drain profile through the ``applyInPandasWithState``
    stateful twin (stream_queries.stateful_user_profiles, projected to
    this query's columns).  Both paths drain the identical per-user
    running counts, so one oracle covers both and the registry count
    no longer depends on the container's protobuf."""
    if _tws_available():
        return S.tws_user_profiles(spark, sf_dir)
    return (S.stateful_user_profiles(spark, sf_dir)
            .select("user", "total_activities", "after_hours_activities"))


_TWS_SQL = _EVENTS_CTE + """
SELECT user,
       CAST(count(*) AS BIGINT) AS total_activities,
       CAST(sum(is_after_hours) AS BIGINT) AS after_hours_activities
FROM ev GROUP BY user
"""


def stream_after_hours_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship threat query as a live complete-mode leaderboard
    (streaming sort+limit)."""
    return S.streaming_after_hours_top10(spark, sf_dir)


_STREAM_TOP10_SQL = _EVENTS_CTE + """
SELECT user, CAST(count(*) AS BIGINT) AS after_hours_count
FROM ev WHERE is_after_hours = 1
GROUP BY user
ORDER BY after_hours_count DESC, user ASC
LIMIT 10
"""


def stream_deduped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicatesWithinWatermark) then per-user
    counts; the testdata has unique event_ids so the batch oracle is a
    DISTINCT-then-count — the planted-duplicate semantics are pinned in
    tests/test_streaming.py."""
    return S.deduped_event_counts(spark, sf_dir)


def stream_purchase_error_pairs(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases matched to same-user
    errors within 30 minutes; the batch oracle is the equivalent
    interval self-join."""
    return S.purchase_error_pairs(spark, sf_dir)


def stream_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-trained KMeans scoring a live windowed feature stream
    (rows-only: cluster assignments are model-specific; batch/stream
    parity is pinned in tests/test_streaming.py)."""
    return S.model_scored_stream(spark, sf_dir)


def stream_static_enriched_counts(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    return S.static_enriched_nation_counts(spark, sf_dir)


_STATIC_ENRICHED_SQL = """
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
"""


QUERIES = {
    "stream_static_enriched_counts": stream_static_enriched_counts,
    "stream_windowed_user_counts": stream_windowed_user_counts,
    "stream_sliding_type_counts": stream_sliding_type_counts,
    "stream_session_windows": stream_session_windows,
    "stream_anomaly_flags": stream_anomaly_flags,
    "stream_stateful_profiles": stream_stateful_profiles,
    "stream_model_scores": stream_model_scores,
    "stream_deduped_counts": stream_deduped_counts,
    "stream_purchase_error_pairs": stream_purchase_error_pairs,
    "stream_after_hours_top10": stream_after_hours_top10,
    "stream_tws_profiles": stream_tws_profiles,
}

ORACLES = {
    "stream_static_enriched_counts": _STATIC_ENRICHED_SQL,
    "stream_windowed_user_counts": _WINDOWED_SQL,
    "stream_sliding_type_counts": _SLIDING_SQL,
    "stream_session_windows": _SESSION_SQL,
    "stream_anomaly_flags": _ANOMALY_FLAGS_SQL,
    "stream_after_hours_top10": _STREAM_TOP10_SQL,
    "stream_stateful_profiles": _STATEFUL_PROFILES_SQL,
    "stream_deduped_counts": """
WITH d AS (SELECT DISTINCT ON (event_id) user_id AS user FROM events)
SELECT user, CAST(count(*) AS BIGINT) AS n_events FROM d GROUP BY user
""",
    "stream_purchase_error_pairs": """
WITH p AS (SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'purchase'),
     e AS (SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'error')
SELECT p.user_id AS user,
       p.event_id AS purchase_event_id,
       e.event_id AS error_event_id,
       CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
FROM p JOIN e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts
 AND e.ts <= p.ts + INTERVAL 30 MINUTE
""",
    "stream_tws_profiles": _TWS_SQL,
}


def stream_countmin_user_cells(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Streaming CM sketch cells (complete mode); linearity makes the
    drained state equal the batch sketch, so this streaming-stateful
    operator is fully value-hash oracle-checkable."""
    return S.countmin_user_cells(spark, sf_dir)


def _cm_stream_sql() -> str:
    from threat_detection_nosql_spark.operators.sketches import (
        _CM_PRIME, countmin_params)
    cells = "\n    UNION ALL\n".join(
        f"    SELECT {i} AS r, ({a} * x + {b}) % {_CM_PRIME} % 1024"
        f" AS c FROM hx"
        for i, (a, b) in enumerate(countmin_params(4)))
    return f"""
WITH hx AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {_CM_PRIME} AS x
  FROM events),
u AS (
{cells}
)
SELECT r, c, CAST(count(*) AS BIGINT) AS cell_cnt
FROM u GROUP BY r, c
"""


QUERIES_TAIL = {"stream_countmin_user_cells": stream_countmin_user_cells}
ORACLES_TAIL = {"stream_countmin_user_cells": _cm_stream_sql()}


def stream_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PSI monitor (complete-mode bin counts, state bounded
    at the bin count; reference edges frozen batch-side)."""
    return S.drift_psi_stream(spark, sf_dir)


_DRIFT_PSI_SQL = f"""
WITH static AS (SELECT value FROM events
                WHERE ts < TIMESTAMP '{S._DRIFT_CUTOFF}'
                  AND value IS NOT NULL),
mm AS (SELECT min(value) AS mn, max(value) AS mx FROM static),
live AS (SELECT value FROM events
         WHERE ts >= TIMESTAMP '{S._DRIFT_CUTOFF}'
           AND value IS NOT NULL),
binned_ref AS (
  SELECT least(greatest(CAST(floor((value - mn)
           / (CASE WHEN mx = mn THEN CAST(1.0 AS DOUBLE)
              ELSE (mx - mn) / {S._DRIFT_BINS} END)) AS INT), 0),
           {S._DRIFT_BINS - 1}) AS bin
  FROM static CROSS JOIN mm),
binned_live AS (
  SELECT least(greatest(CAST(floor((value - mn)
           / (CASE WHEN mx = mn THEN CAST(1.0 AS DOUBLE)
              ELSE (mx - mn) / {S._DRIFT_BINS} END)) AS INT), 0),
           {S._DRIFT_BINS - 1}) AS bin
  FROM live CROSS JOIN mm),
ref AS (SELECT bin, CAST(count(*) AS BIGINT) AS ref_n
        FROM binned_ref GROUP BY bin),
cur AS (SELECT bin, CAST(count(*) AS BIGINT) AS cur_n
        FROM binned_live GROUP BY bin),
tot AS (SELECT (SELECT sum(ref_n) FROM ref) AS ref_tot,
               (SELECT sum(cur_n) FROM cur) AS cur_tot)
SELECT COALESCE(ref.bin, cur.bin) AS bin,
       COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n,
       round(greatest(COALESCE(ref_n, 0) / ref_tot, {S._DRIFT_EPS}), 6)
         AS ref_frac,
       round(greatest(COALESCE(cur_n, 0) / cur_tot, {S._DRIFT_EPS}), 6)
         AS cur_frac,
       round((greatest(COALESCE(cur_n, 0) / cur_tot, {S._DRIFT_EPS})
              - greatest(COALESCE(ref_n, 0) / ref_tot, {S._DRIFT_EPS}))
             * ln(greatest(COALESCE(cur_n, 0) / cur_tot, {S._DRIFT_EPS})
                  / greatest(COALESCE(ref_n, 0) / ref_tot,
                             {S._DRIFT_EPS})), 6) AS psi_term
FROM ref FULL OUTER JOIN cur USING (bin) CROSS JOIN tot
"""


QUERIES_TAIL["stream_drift_psi"] = stream_drift_psi
ORACLES_TAIL["stream_drift_psi"] = _DRIFT_PSI_SQL


def stream_unmatched_purchases(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Left-outer stream-stream interval join with watermark-deferred
    unmatched emission (see streaming.stream_queries.
    unmatched_purchases — the oracle replays the final-watermark
    cutoff: purchases whose 30-minute match interval the global
    watermark never passed do not get an unmatched row)."""
    return S.unmatched_purchases(spark, sf_dir)


_UNMATCHED_PURCHASES_SQL = """
WITH p AS (SELECT user_id AS u, event_id AS pid, ts AS pts
           FROM events WHERE event_type = 'purchase'),
e AS (SELECT user_id AS u, event_id AS eid, ts AS ets
      FROM events WHERE event_type = 'error'),
wm AS (SELECT least((SELECT max(pts) FROM p),
                    (SELECT max(ets) FROM e))
              - INTERVAL 1 HOUR AS w),
m AS (SELECT p.u AS user, p.pid AS purchase_event_id,
             e.eid AS error_event_id,
             CAST(epoch_us(e.ets) - epoch_us(p.pts) AS BIGINT) AS gap_us
      FROM p JOIN e ON p.u = e.u AND e.ets >= p.pts
                   AND e.ets <= p.pts + INTERVAL 30 MINUTES),
um AS (SELECT p.u AS user, p.pid AS purchase_event_id,
              CAST(-1 AS BIGINT) AS error_event_id,
              CAST(-1 AS BIGINT) AS gap_us
       FROM p CROSS JOIN wm
       WHERE NOT EXISTS (SELECT 1 FROM e
                         WHERE e.u = p.u AND e.ets >= p.pts
                           AND e.ets <= p.pts + INTERVAL 30 MINUTES)
         AND p.pts + INTERVAL 30 MINUTES < wm.w)
SELECT * FROM m UNION ALL SELECT * FROM um
"""

QUERIES_TAIL["stream_unmatched_purchases"] = stream_unmatched_purchases
ORACLES_TAIL["stream_unmatched_purchases"] = _UNMATCHED_PURCHASES_SQL


def stream_bloom_user_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bloom word table (see streaming.stream_queries.
    bloom_user_words); oracle = the batch word build over distinct
    user ids (bit_or idempotence makes them equal)."""
    return S.bloom_user_words(spark, sf_dir)


_BLOOM_WORDS_SQL = """
WITH ix AS (SELECT unnest(range(0, 4)) AS i),
users AS (SELECT DISTINCT user_id::VARCHAR AS u FROM events),
bpos AS (SELECT DISTINCT
           CAST(('0x' || substr(md5('bl' || i::VARCHAR || ':' || u),
                 1, 15)) AS BIGINT) % 7200 AS pos
         FROM users CROSS JOIN ix)
SELECT CAST((pos - pos % 60) / 60 AS BIGINT) AS word,
       bit_or(1::BIGINT << CAST(pos % 60 AS INT)) AS word_bits
FROM bpos GROUP BY 1
"""

QUERIES_TAIL["stream_bloom_user_words"] = stream_bloom_user_words
ORACLES_TAIL["stream_bloom_user_words"] = _BLOOM_WORDS_SQL


def stream_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming global top-20 leaderboard (streaming.stream_queries.
    topk_active_users); oracle = the batch top-20 (complete-mode
    re-emission makes the final drain equal the batch answer)."""
    return S.topk_active_users(spark, sf_dir)


_TOPK_USERS_SQL = """
SELECT user_id AS "user", CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
ORDER BY n_events DESC, "user" ASC
LIMIT 20
"""

QUERIES_TAIL["stream_topk_users"] = stream_topk_users
ORACLES_TAIL["stream_topk_users"] = _TOPK_USERS_SQL


def stream_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sequence counter (streaming.stream_queries.
    markov_transition_counts); oracle = the batch per-user lag()
    pairing (single-batch drive makes them equal)."""
    return S.markov_transition_counts(spark, sf_dir)


_MARKOV_STREAM_SQL = """
WITH pairs AS (
  SELECT user_id AS "user",
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_activity,
         event_type AS activity
  FROM events)
SELECT "user", prev_activity, activity, CAST(count(*) AS BIGINT) AS n
FROM pairs WHERE prev_activity IS NOT NULL
GROUP BY 1, 2, 3
"""

QUERIES_TAIL["stream_markov_transitions"] = stream_markov_transitions
ORACLES_TAIL["stream_markov_transitions"] = _MARKOV_STREAM_SQL


def stream_hll_user_registers(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Streaming HLL twin (streaming.stream_queries.hll_user_registers);
    oracle = the batch register build (max-mergeability makes the
    drained state equal the batch sketch)."""
    return S.hll_user_registers(spark, sf_dir)


def _hll_stream_sql() -> str:
    from threat_detection_nosql_spark.operators.sketches import (
        _HLL_W_BITS,
    )
    wmod = 1 << _HLL_W_BITS
    rmax = _HLL_W_BITS + 1
    return f"""
WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS x
  FROM events)
SELECT x // {wmod} AS idx,
       max(CASE WHEN x % {wmod} = 0 THEN {rmax}
                ELSE {rmax} - length(bin(x % {wmod})) END) AS r
FROM h GROUP BY 1
"""


QUERIES_TAIL["stream_hll_user_registers"] = stream_hll_user_registers
ORACLES_TAIL["stream_hll_user_registers"] = _hll_stream_sql()


def stream_token_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vocabulary stats twin (streaming.stream_queries.
    token_df_counts); oracle = the batch token df/cf aggregate — the
    map-side first-in-doc flag makes df a plain sum, so the drained
    state equals the batch answer under ANY batching (docs never
    split across rows)."""
    return S.token_df_counts(spark, sf_dir)


_TOKEN_DF_SQL = r"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
             FROM documents),
tf AS (SELECT doc_id, token FROM tok WHERE token <> '')
SELECT token,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS cf
FROM tf GROUP BY token
"""

QUERIES_TAIL["stream_token_df"] = stream_token_df
ORACLES_TAIL["stream_token_df"] = _TOKEN_DF_SQL


def stream_markov_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-resequenced streaming Markov counter
    (streaming.stream_queries.markov_ordered_transitions): pairs are
    counted only when the watermark passes the later event, draining
    the per-user buffer in (ts, event_id) order — so cross-batch
    out-of-order arrival no longer corrupts the sequence (the
    documented caveat of stream_markov_transitions, now closed). The
    oracle replays the final-watermark cutoff: lag() pairs over the
    rows at or below max(ts) − 1h, in event-time order — rows above
    the final watermark are never emitted, exactly like the
    stream-stream join tail."""
    return S.markov_ordered_transitions(spark, sf_dir)


_MARKOV_ORDERED_SQL = """
WITH wm AS (SELECT epoch_ms(max(ts)) - 3600000 AS w FROM events),
inw AS (SELECT user_id AS "user", event_type AS activity, ts, event_id
        FROM events, wm WHERE epoch_ms(ts) <= wm.w),
pairs AS (
  SELECT "user",
         lag(activity) OVER (PARTITION BY "user"
                             ORDER BY ts, event_id) AS prev_activity,
         activity
  FROM inw)
SELECT "user", prev_activity, activity, CAST(count(*) AS BIGINT) AS n
FROM pairs WHERE prev_activity IS NOT NULL
GROUP BY 1, 2, 3
"""

QUERIES_TAIL["stream_markov_ordered"] = stream_markov_ordered
ORACLES_TAIL["stream_markov_ordered"] = _MARKOV_ORDERED_SQL


def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of advanced.incremental_corpus_dedup's near-dup
    screen (streaming.stream_queries.incremental_dedup_matches): the
    incoming batch arrives as a document stream, signatures computed
    per-row with STATELESS array expressions (no groupBy — a doc is
    one row), banded against a static corpus-side signature frame;
    the one stateful op is the min-match-per-doc aggregation. Drained
    state == the batch near screen under any batching because every
    joined match row is a pure function of the single arriving row."""
    return S.incremental_dedup_matches(spark, sf_dir)


def _stream_inc_dedup_sql() -> str:
    from threat_detection_nosql_spark.queries.advanced import (
        _MH_BAND_COND,
        _MH_EST,
        _MH_SIG,
    )
    return rf"""
WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS wds
           FROM documents),
sh AS (SELECT DISTINCT doc_id,
              wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2] AS shingle
       FROM w, LATERAL (SELECT unnest(range(1, len(wds) - 1)) AS i) ix),
sig AS (SELECT doc_id,
        {_MH_SIG}
        FROM sh GROUP BY doc_id),
bkt AS (SELECT doc_id,
               CAST(('0x' || substr(md5('batch:'
                    || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 10000 AS bk
        FROM documents)
SELECT a.doc_id, min(b.doc_id) AS matched_old
FROM sig a
JOIN bkt na ON na.doc_id = a.doc_id AND na.bk >= 8000
JOIN sig b ON ({_MH_BAND_COND})
JOIN bkt ob ON ob.doc_id = b.doc_id AND ob.bk < 8000
JOIN sig sa ON sa.doc_id = a.doc_id
JOIN sig sb ON sb.doc_id = b.doc_id
WHERE ({_MH_EST}) >= 8
GROUP BY a.doc_id
"""


QUERIES_TAIL["stream_incremental_dedup"] = stream_incremental_dedup
ORACLES_TAIL["stream_incremental_dedup"] = _stream_inc_dedup_sql()


def stream_peak_concurrency(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Watermark-resequenced streaming concurrency sweep
    (streaming.stream_queries.ordered_peak_concurrency): the
    streaming twin of temporal.peak_concurrency_by_type. The oracle
    replays the final-watermark cutoff — boundaries at or below
    max(ts) − 1h (epoch-ms floor, both engines), swept per type in
    (t, delta) order. A −1 boundary inside the cutoff implies its
    source event is too (t−30m < t), so filtering raw boundaries by
    the cutoff is exactly the stream's atomic-pair drop."""
    return S.ordered_peak_concurrency(spark, sf_dir)


_PEAK_STREAM_SQL = """
WITH wm AS (SELECT epoch_ms(max(ts)) - 3600000 AS w FROM events),
bounds AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 30 MINUTE AS t, -1 AS delta
  FROM events),
inw AS (SELECT b.event_type, b.t, b.delta
        FROM bounds b, wm WHERE epoch_ms(b.t) <= wm.w),
run AS (
  SELECT event_type, t, delta,
         sum(delta) OVER (PARTITION BY event_type
                          ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM inw),
stats AS (
  SELECT event_type, CAST(max(run) AS BIGINT) AS peak_concurrency,
         CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_opens
  FROM run GROUP BY event_type)
SELECT r.event_type, s.n_opens, s.peak_concurrency,
       strftime(min(r.t), '%Y-%m-%d %H:%M:%S') AS peak_at
FROM run r JOIN stats s ON r.event_type = s.event_type
          AND r.run = s.peak_concurrency
GROUP BY r.event_type, s.n_opens, s.peak_concurrency
ORDER BY r.event_type
"""

QUERIES_TAIL["stream_peak_concurrency"] = stream_peak_concurrency
ORACLES_TAIL["stream_peak_concurrency"] = _PEAK_STREAM_SQL


def stream_cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC live table (streaming.stream_queries.
    cdc_live_state); oracle = the batch last-writer-wins winner per
    key (struct-max associativity makes drained == batch under any
    batching — the one CDC twin that needs no watermark buffer)."""
    return S.cdc_live_state(spark, sf_dir)


_STREAM_CDC_SQL = """
WITH log AS (
  SELECT user_id AS k, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events),
ranked AS (
  SELECT k, op, cents,
         row_number() OVER (PARTITION BY k
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM log)
SELECT k AS user_id, cents AS live_value_cents
FROM ranked
WHERE rn = 1 AND op = 'U'
ORDER BY user_id
"""

QUERIES_TAIL["stream_cdc_state"] = stream_cdc_state
ORACLES_TAIL["stream_cdc_state"] = _STREAM_CDC_SQL


def stream_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-resequenced streaming funnel
    (streaming.stream_queries.funnel_ordered_conversion): per-user
    view → click → purchase stage progression with the ordered-funnel
    strict-after rule, correct under any batching / arrival order via
    the event-time-timer buffer (the stream_markov_ordered recipe —
    stage assignments are only made when the watermark passes the
    event, processing each user's drained rows in event-time order).
    The oracle replays the final-watermark cutoff: the batch stacked
    conditional-min funnel over rows at or below max(ts) − 1h."""
    return S.funnel_ordered_conversion(spark, sf_dir)


_FUNNEL_ORDERED_SQL = """
WITH wm AS (SELECT epoch_ms(max(ts)) - 3600000 AS w FROM events),
inw AS (SELECT user_id AS "user", ts, event_type AS activity
        FROM events, wm WHERE epoch_ms(ts) <= wm.w),
w1 AS (SELECT "user", ts, activity,
              min(CASE WHEN activity = 'view' THEN ts END)
                OVER (PARTITION BY "user") AS t1
       FROM inw),
w2 AS (SELECT *, min(CASE WHEN activity = 'click' AND ts > t1 THEN ts END)
                   OVER (PARTITION BY "user") AS t2
       FROM w1),
w3 AS (SELECT *, min(CASE WHEN activity = 'purchase' AND ts > t2 THEN ts END)
                   OVER (PARTITION BY "user") AS t3
       FROM w2),
pu AS (SELECT "user", any_value(t1) AS t1, any_value(t2) AS t2,
              any_value(t3) AS t3
       FROM w3 GROUP BY "user")
SELECT CAST(count(t1) AS BIGINT) AS viewed,
       CAST(count(t2) AS BIGINT) AS clicked_after_view,
       CAST(count(t3) AS BIGINT) AS purchased_after_click
FROM pu
"""

QUERIES_TAIL["stream_funnel_ordered"] = stream_funnel_ordered
ORACLES_TAIL["stream_funnel_ordered"] = _FUNNEL_ORDERED_SQL


def stream_linear_attribution(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Streaming twin of temporal.linear_touch_attribution: the
    in-window (purchase, touch) pairs arrive from a stream-stream
    self interval join (streaming.stream_queries.
    linear_attribution_pairs — delay-bounded join state, pairs emit
    as soon as both sides arrive), then the SAME money-conserving
    credit rollup (temporal.attribution_credit_rollup) runs over the
    drained pair table, so the oracle is the batch attribution SQL
    verbatim."""
    from threat_detection_nosql_spark.queries.temporal import (
        attribution_credit_rollup,
    )
    pairs = S.linear_attribution_pairs(spark, sf_dir)
    return attribution_credit_rollup(pairs)


def _stream_linear_attr_sql() -> str:
    from threat_detection_nosql_spark.queries.temporal import (
        _LINEAR_ATTR_SQL,
    )
    return _LINEAR_ATTR_SQL


QUERIES_TAIL["stream_linear_attribution"] = stream_linear_attribution
ORACLES_TAIL["stream_linear_attribution"] = _stream_linear_attr_sql()


def stream_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KMV quantile sketch (streaming.stream_queries.
    kmv_quantile_agg): bottom-k-by-md5 state per event_type — FIXED
    state size regardless of stream length — re-emitting discrete
    quantiles each batch. Oracle = the batch KMV rollup SQL verbatim
    (metrics.kmv_value_quantiles): the bottom-k of a union is the
    bottom-k of per-part bottom-k's, so drained == batch under any
    batching."""
    return S.stream_kmv_quantiles(spark, sf_dir)


def _stream_kmv_sql() -> str:
    from threat_detection_nosql_spark.queries.metrics import _KMV_SQL
    return _KMV_SQL


QUERIES_TAIL["stream_kmv_quantiles"] = stream_kmv_quantiles
ORACLES_TAIL["stream_kmv_quantiles"] = _stream_kmv_sql()


def stream_chunked_documents(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Chunk-on-ingest: the RAG chunking transform applied to the live
    document feed — fully STATELESS (append mode, no watermark, no
    aggregation), so drained == batch under any batching by
    construction and backpressure is the only scaling concern. Oracle
    = the batch chunking SQL verbatim."""
    from threat_detection_nosql_spark.queries.pipeline import chunk_select
    table = S.run_stream_to_table(
        chunk_select(S.documents_stream(spark, sf_dir)), mode="append")
    return table.orderBy("doc_id", "chunk_idx")


def _stream_chunks_sql() -> str:
    from threat_detection_nosql_spark.queries.pipeline import _CHUNKS_SQL
    return _CHUNKS_SQL


QUERIES_TAIL["stream_chunked_documents"] = stream_chunked_documents
ORACLES_TAIL["stream_chunked_documents"] = _stream_chunks_sql()


def stream_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set intersection ON THE STREAM (round 11): the
    per-type bottom-k distinct-user-hash sketch accumulates as
    applyInPandasWithState state (FIXED k entries per type — the
    set-dedup lives inside the bounded sample), the pairwise
    intersection estimator runs batch-side over the drained sketches,
    and the exact-audit column comes from the static warehouse table
    — the "sketch the firehose, audit the warehouse" composition.
    Oracle = the batch theta SQL verbatim: bottom-k-of-union
    mergeability makes drained == batch under any batching."""
    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.operators.sketches import (
        THETA_K, theta_overlap_estimates)
    from threat_detection_nosql_spark.sources.readers import load_table
    sk = S.stream_theta_sketches(spark, sf_dir, THETA_K)
    est = theta_overlap_estimates(sk, THETA_K)
    du = (load_table(spark, sf_dir, "events")
          .select("event_type", "user_id").distinct())
    exact = (du.select(F.col("event_type").alias("type_a"), "user_id")
             .join(du.select(F.col("event_type").alias("type_b"),
                             F.col("user_id").alias("ub")),
                   F.col("user_id") == F.col("ub"))
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count("*").cast("long").alias("exact_overlap")))
    return (est.join(exact, ["type_a", "type_b"], "left")
            .select("type_a", "type_b", "n_common", "est_overlap",
                    F.coalesce("exact_overlap", F.lit(0)).cast("long")
                    .alias("exact_overlap"))
            .orderBy("type_a", "type_b"))


def _stream_theta_sql() -> str:
    from threat_detection_nosql_spark.queries.metrics import _THETA_SQL
    return _THETA_SQL


QUERIES_TAIL["stream_theta_overlap"] = stream_theta_overlap
ORACLES_TAIL["stream_theta_overlap"] = _stream_theta_sql()
