"""Streaming queries, driver-checkable: each runs a REAL Structured
Streaming query (file source over the events table, availableNow
trigger, complete-mode memory sink), blocks until the bounded stream
drains, and returns the materialized result — which must equal the
batch answer, so the DuckDB oracle applies to the streaming engine
too (A1-A3 / T1-T2 / T5, streaming/StreamingJobImpl.scala:43-77).

Output mode choice: complete (not the reference's append) because a
bounded replay under append+watermark never finalizes the trailing
windows — the stream ends before the watermark passes them. Complete
mode emits every window, making stream == batch an exact equality.
Append+watermark semantics (late-data eviction) are pinned in
tests/test_streaming.py instead, where micro-batch boundaries are
controlled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..operators.metrics import conform_metric, windowed_sum
from ..sources.parquet import read_table
from ..streaming.sources import read_documents_stream, read_events_stream
from ..streaming.telemetry import record_bounded_run
from .parity import NINETY_SECONDS, _metric_oracle
from .registry import register


#: state partition count for the BOUNDED replays in this module.
#: Stateful operators fix their state partitioning from
#: spark.sql.shuffle.partitions when the query first starts (it is
#: recorded in the checkpoint), and every micro-batch then pays a
#: state-store open/maintain/commit per partition — a fixed cost that
#: dwarfs the actual state at replay scale. Measured at sf0.1
#: (tools/exp_stream_parts.py, median of 3): stream_join_suite
#: 11.4 s @ 32 partitions -> 4.6 @ 16 -> 2.8 @ 8 -> 2.3 @ 4;
#: stream_bytes_90s_suite 3.6 -> 2.2 -> 1.8 -> 1.7. Partitioning is
#: by key hash either way, so results are identical (the oracle rows
#: prove it). 8 keeps headroom for parallelism at these sizes; a
#: PRODUCTION stream sizes this to state volume / executor count at
#: its own start — it is a per-query knob, not an engine constant.
#:
#: r11 (r10 verdict #6): the applyInPandasWithState runner
#: (stream_running_totals) probed separately — its hot cost is
#: per-key Python invocation, so more partitions buy Python-worker
#: parallelism where the window aggs only pay more state commits.
#: Series (exp_stream_parts.py running_totals, sf0.1 median-of-3):
#: 4 -> 5.17, 8 -> 4.21, 16 -> 3.85, 32 -> 5.16; interleaved 8-vs-16
#: A/B steady state ~3.9 vs ~3.6. The ~6-8% edge at 16 is inside
#: window noise and this session is SHARED — 16 costs join_suite
#: 1.6x — so 8 stays the pinned default for every bounded replay.
#:
#: r17: re-probed 8-vs-4 under the r16 maintenance deferral with
#: fresh-process interleaved A/Bs (tools/ab_process.py, 3 legs x 3
#: runs): the window-agg replays all prefer 4 — stream_join_suite
#: 4.60 -> 3.33 (1.38x), stream_bytes_90s 2.45 -> 2.17,
#: stream_curated_ingest 1.63 -> 1.45, stream_dedup_events 1.15 ->
#: 1.07 — consistent with the r8 series' 4-is-fastest that "headroom"
#: had overridden; the stall mode that argued for headroom is gone.
#: The applyInPandasWithState runner moves the OTHER way (same
#: protocol: 4.70 @ 8 vs 5.31 @ 4 — per-key Python invocation wants
#: the parallelism), so it keeps 8 on its own child session
#: (_RT_STATE_PARTITIONS below; _bounded_session is keyed by count).
#: A 16-partition rt variant was also probed and shipped briefly:
#: its isolated series read 14% better but TWO in-path interleaved
#: A/Bs said wash-to-worse, so 8 stands.
_BOUNDED_STATE_PARTITIONS = 4

#: state partitions for stream_running_totals only (see above).
_RT_STATE_PARTITIONS = 8

#: r17 measurement hook (tools/ab_process.py): "true" restores
#: core-count-first AQE coalescing on the bounded child sessions.
_BOUNDED_PARALLELISM_FIRST = "false"


def _bounded_session(
    spark: SparkSession, partitions: int | None = None
) -> SparkSession:
    """Dedicated child session (shared SparkContext, own conf/catalog)
    for the bounded replays, with shuffle partitions pinned to
    _BOUNDED_STATE_PARTITIONS (r7 ADVICE-adjacent verdict #5: the old
    shape flipped spark.sql.shuffle.partitions on the CALLER's session
    around start+drain, so concurrent batch work on that session could
    plan at the bounded count). Each registered stream query rebinds
    to this session, so its streams, memory-sink tables, and skinny
    post-processing all live here while the caller's session — and
    anything running on it concurrently — keeps its own partitioning
    end to end (pinned in tests/test_streaming.py).

    Children are cached on the parent session object — one per
    (parent, partition count), created lazily; the per-count keying is
    r17, letting the applyInPandasWithState runner use its own probed
    count (_RT_STATE_PARTITIONS) while everything else shares the
    default: memory-sink tables re-register per call exactly
    as they previously did on the parent, so driver-heap behavior is
    unchanged. Explicitly-set spark.sql.* confs are copied from the
    parent at creation (session time zone, legacy parquet nanos, ...)
    because newSession() starts from the static SparkConf, not the
    parent's runtime conf."""
    if partitions is None:
        partitions = _BOUNDED_STATE_PARTITIONS
    sessions = getattr(spark, "_kcbdml9_bounded_sessions", None)
    if sessions is None:
        sessions = {}
        spark._kcbdml9_bounded_sessions = sessions
    bs = sessions.get(partitions)
    if bs is None:
        bs = spark.newSession()
        for r in spark.sql("SET").collect():
            if r["key"].startswith("spark.sql."):
                try:
                    bs.conf.set(r["key"], r["value"])
                except Exception:
                    pass
        bs.conf.set("spark.sql.shuffle.partitions", str(partitions))
        # r16: state-store maintenance (snapshot + old-delta cleanup,
        # default every 60s) is pure overhead for a BOUNDED replay —
        # its checkpoint is abandoned at drain, so snapshot-bounded
        # recovery time protects nothing, while each fire iterates
        # every provider loaded in the process and stalls in-flight
        # micro-batch commits. Measured (tools/ fixed-code probes,
        # sf0.1): stream_join_suite runs read a stable 3.5-3.8 s until
        # the first fire ~60 s after the process's first state store
        # loads, then 2-8x blowups (13.9/22.2/30.2/36.8 s observed)
        # with recovery after the fire — the mechanism behind the
        # bench's bouncing stream rows. 600 s puts the first fire an
        # order of magnitude past any replay's drain while still
        # reclaiming dead providers in a long-lived session (a paused
        # or hour-scale interval would let abandoned replay providers
        # accumulate in executor memory). The interval is pinned
        # process-wide by the FIRST store load
        # (StateStore.startMaintenanceIfNeeded), so a production
        # stream started later in the same process inherits it —
        # acceptable: production jobs (streaming/job.py) own their
        # process, and 600 s only defers snapshot compaction, never
        # state correctness.
        bs.conf.set(
            "spark.sql.streaming.stateStore.maintenanceInterval", "600s"
        )
        # r17: within the bounded replays, coalesce post-shuffle
        # partitions by the advisory SIZE target instead of stopping
        # at the core count (parallelismFirst=false — the setting
        # Spark's own docs recommend for size-respecting coalescing).
        # A replay's non-stateful stages are KB-scale: coalescing them
        # to one task removes pure dispatch overhead. Measured via a
        # full-sweep experiment (this conf set GLOBALLY read -0.5 to
        # -0.95 s on the stream rows but +2.5 to +5.3 s on the dedup
        # pair joins, whose post-shuffle stages are compute-dense —
        # so it ships ONLY here, on the child session the bounded
        # replays own; fresh-process interleaved A/B in
        # OPTIMIZATION_r17.md). Scale-neutral: at production replay
        # sizes post-shuffle partitions exceed the advisory target
        # and the setting is a no-op.
        bs.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            _BOUNDED_PARALLELISM_FIRST,
        )
        sessions[partitions] = bs
    return bs


def _start_bounded_metric(spark: SparkSession, sf_dir: str, key, tag: str, name: str):
    """Start one windowed metric as a bounded stream into a
    complete-mode memory sink; return the StreamingQuery handle (the
    caller awaits — letting suites drain several StreamExecutions
    concurrently instead of serializing their fixed startup cost)."""
    src = read_events_stream(spark, sf_dir)
    agg = windowed_sum(
        src, key, "90 seconds", ts_col="ts", value_col="value", agg=dsum("value")
    )
    metric = conform_metric(agg, key if isinstance(key, str) else "app", tag)
    return (
        metric.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def _run_bounded_metric(
    spark: SparkSession, sf_dir: str, key, tag: str, name: str
) -> DataFrame:
    """Run one windowed metric as a bounded stream into a complete-mode
    memory sink; return the sink table."""
    spark = _bounded_session(spark)
    _start_bounded_metric(spark, sf_dir, key, tag, name).awaitTermination()
    return spark.table(name)


def _drain_to_parquet(df: DataFrame, name: str):
    """Start a bounded append-mode stream into a throwaway PARQUET
    sink and return (query, read-back thunk). Row-heavy streams must
    NOT use the memory sink: its rows live on the DRIVER heap for the
    JVM's lifetime (a full-table sink at 100 TB is absurd, and even
    locally the retained tables pressure every later query's GC —
    measured as a uniform ~15% slowdown across a 48-query bench run).
    The parquet sink is what a production ingest writes anyway.

    Sink + checkpoint dirs live under the process scratch root
    (tmpdirs.scratch_dir) — reclaimed at exit instead of leaking into
    /tmp per invocation. The read-back pins the stream frame's OWN
    schema rather than re-inferring it from footers: a bounded stream
    that legitimately commits zero rows (e.g. a join with no matches
    at a sparse SF) writes no data files, and schema inference would
    throw where the correct answer is an empty frame."""
    from ..tmpdirs import scratch_dir

    out = scratch_dir(f"{name}_out_")
    ckpt = scratch_dir(f"{name}_ckpt_")
    q = (
        df.writeStream.format("parquet")
        .queryName(name)
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    spark, schema = df.sparkSession, df.schema

    def read_back() -> DataFrame:
        return spark.read.schema(schema).parquet(out)

    return q, read_back


def stream_bytes_antenna_90s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as true streaming: file-source replay -> 90 s tumbling
    window -> sum -> metric conformance, executed by the streaming
    engine (StreamExecution micro-batches + state store), result
    hash-checked against the same oracle as the batch phrasing."""
    return _run_bounded_metric(
        spark, sf_dir, "event_type", "antenna_bytes_total", "stream_antenna_90s"
    )


def stream_bytes_user_90s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 as true streaming (key user_id)."""
    return _run_bounded_metric(
        spark, sf_dir, "user_id", "user_bytes_total", "stream_user_90s"
    )


def _start_app_metric(spark: SparkSession, sf_dir: str):
    """A3's stream (key parsed out of the JSON payload, P3), started
    but not awaited."""
    src = read_events_stream(spark, sf_dir).withColumn(
        "app", F.get_json_object("props", "$.k")
    )
    agg = windowed_sum(
        src, "app", "90 seconds", ts_col="ts", value_col="value", agg=dsum("value")
    )
    metric = conform_metric(agg, "app", "app_bytes_total")
    return (
        metric.writeStream.format("memory")
        .queryName("stream_app_90s")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def stream_bytes_app_90s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 as true streaming: the key comes out of the JSON payload
    (P3) on the stream before windowing."""
    spark = _bounded_session(spark)
    _start_app_metric(spark, sf_dir).awaitTermination()
    return spark.table("stream_app_90s")


@register(
    "stream_bytes_90s_suite",
    oracle=f"""
        ({_metric_oracle("event_type", NINETY_SECONDS, "antenna_bytes_total")})
        UNION ALL
        ({_metric_oracle("user_id", NINETY_SECONDS, "user_bytes_total")})
        UNION ALL
        ({_metric_oracle(
            "json_extract_string(props, '$.k')", NINETY_SECONDS,
            "app_bytes_total")})
    """,
)
def stream_bytes_90s_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + A2 + A3 as true streaming, one registration (the ``type``
    column already discriminates the three metric families, so the
    union is the natural suite shape — same consolidation pattern the
    batch bytes_90s suite uses). Each constituent still runs its own
    full StreamExecution (file replay, state store, complete-mode
    drain); only the registration count shrinks — r6 folds the antenna
    stream in too, freeing a driver row for the stream-join suite. The
    three StreamExecutions START together and drain concurrently
    (their fixed startup + replay cost overlaps; measured ~5.8 s
    serialized -> ~3 s concurrent at sf0.1) — same pattern a real
    multi-query streaming job uses (streaming/job.py)."""
    spark = _bounded_session(spark)
    queries = [
        _start_bounded_metric(
            spark, sf_dir, "event_type", "antenna_bytes_total", "stream_antenna_90s"
        ),
        _start_bounded_metric(
            spark, sf_dir, "user_id", "user_bytes_total", "stream_user_90s"
        ),
        _start_app_metric(spark, sf_dir),
    ]
    for q in queries:
        q.awaitTermination()
        record_bounded_run("stream_bytes_90s_suite", q)
    return (
        spark.table("stream_antenna_90s")
        .unionAll(spark.table("stream_user_90s"))
        .unionAll(spark.table("stream_app_90s"))
    )


@register(
    "stream_dedup_events",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the ingestion-side dedup stage of a
    training-data pipeline. Two independent file-source replays of the
    events table are unioned — every event arrives (at least) twice,
    the at-least-once delivery a real broker gives you — and
    ``dropDuplicates`` on the event key emits only the first arrival,
    maintained by the streaming state store across micro-batches.
    The oracle is simply the distinct event set, so the driver
    hash-checks that the streaming engine suppressed every redelivery.

    No watermark here because the replay is bounded and complete-state
    dedup makes stream == batch an exact equality; unbounded streams
    use ``dropDuplicatesWithinWatermark`` so state is evicted once an
    event key can no longer be redelivered — that production variant's
    eviction semantics are pinned in tests/test_streaming.py, where
    micro-batch boundaries are controlled."""
    spark = _bounded_session(spark)
    doubled = read_events_stream(spark, sf_dir).unionAll(
        read_events_stream(spark, sf_dir)
    )
    deduped = doubled.dropDuplicates(["event_id"])
    q, read_back = _drain_to_parquet(deduped, "stream_dedup_events")
    q.awaitTermination()
    record_bounded_run("stream_dedup_events", q)
    return read_back()


def _curated_ingest_oracle() -> str:
    from .dedup import _NORM_SQL
    from .text import _SW_ARR_SQL, _tokens_sql

    t = _tokens_sql()
    return f"""
        SELECT doc_id, text, lang, source, n_chars,
               {_NORM_SQL} AS content_hash
        FROM documents
        WHERE len({t}) >= 5
          AND CAST(len(list_filter({t}, x -> list_contains({_SW_ARR_SQL}, x)))
                   AS DOUBLE) / CAST(len({t}) AS DOUBLE) <= 0.9
          AND CAST(len(list_distinct({t})) AS DOUBLE)
                / CAST(len({t}) AS DOUBLE) >= 0.1
    """


@register("stream_curated_ingest", oracle=_curated_ingest_oracle())
def stream_curated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-ingest curation operator
    (streaming/curation.curate_stream) as a driver-checked query: two
    independent file-source replays of the documents table are unioned
    — every document arrives (at least) twice, the at-least-once
    delivery a real broker gives you — and the curation stream
    quality-gates each arrival (word count, stopword ratio, lexical
    diversity: the same thresholds as the batch curator) then
    suppresses redeliveries with ``dropDuplicatesWithinWatermark`` on
    the normalized content hash, state evicted by the watermark. The
    oracle is the quality-passing distinct document set plus its
    content hash, so the driver hash-checks both halves of the ingest
    path (gate arithmetic AND dedup) as executed by the real streaming
    engine (StreamExecution, state store, watermark advance). The
    event-time axis (``ts`` = epoch + doc_id seconds,
    streaming/sources.read_documents_stream) is dropped from the
    result to keep the comparison engine-portable; eviction *timing*
    semantics are pinned in tests/test_stream_curation.py where
    micro-batch boundaries are controlled."""
    from ..streaming.curation import curate_stream

    spark = _bounded_session(spark)
    doubled = read_documents_stream(spark, sf_dir).unionAll(
        read_documents_stream(spark, sf_dir)
    )
    curated = curate_stream(doubled)
    q, read_back = _drain_to_parquet(curated.drop("ts"), "stream_curated_ingest")
    q.awaitTermination()
    record_bounded_run("stream_curated_ingest", q)
    return read_back()


# --- stream joins ----------------------------------------------------------

#: +/- window for the stream-stream interval join (same as the batch
#: events_near_errors range, queries/parity.py)
_JOIN_RANGE_S = 300


@register(
    "stream_join_suite",
    oracle=f"""
        SELECT 'near_errors' AS variant, e.event_id,
               CAST(NULL AS VARCHAR) AS k,
               CAST(COUNT(*) AS DOUBLE) AS v
        FROM events e
        JOIN events r
          ON r.event_type = 'error'
         AND r.user_id = e.user_id
         AND r.event_id <> e.event_id
         AND abs(epoch_ms(e.ts) - epoch_ms(r.ts)) <= {_JOIN_RANGE_S * 1000}
        GROUP BY e.event_id
        UNION ALL
        SELECT 'enrich', e.event_id, c.c_name, e.value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming joins, both as real StreamExecutions, one suite row
    (variant, event_id, k, v):

    - ``near_errors``: a true STREAM-STREAM interval join — the events
      stream inner-joined to an error-filtered replay of itself on
      user_id plus a +/-5 min event-time range condition, the join
      state maintained by the streaming state store across
      micro-batches (Spark's symmetric hash join; each side buffers
      rows until the other side's watermark passes the range bound).
      The joined PAIRS are what the stream emits (append mode — inner
      join output finalizes at match time); the per-event count is a
      batch aggregation over the drained sink, because an unwindowed
      per-key aggregate downstream of a stream-stream join has no
      append-mode finalization point on a bounded replay. Matches the
      batch interval-join oracle exactly, so the driver hash-proves
      the streaming join loses/duplicates no pair.
    - ``enrich``: a STREAM-STATIC join — the events stream joined to
      the static customer dimension (J1's stream-side twin,
      StreamingJobImpl.scala:55-60 does the same against a JDBC dim).
      The static side plans as a broadcast per micro-batch, so the
      stream never shuffles.

    Watermark note: both sides carry a generous watermark (30 days) —
    on a bounded availableNow replay the watermark's only role here is
    state-cleanup eligibility, and a tight bound could DROP genuinely
    late rows mid-replay (the file source does not replay in event-time
    order), breaking stream==batch equality. Production tightens it to
    the real out-of-orderness bound; the state-eviction semantics under
    a tight watermark are pinned in tests/test_streaming.py.
    """
    spark = _bounded_session(spark)
    # stream-stream: events x errors within +/- 5 min per user.
    # Watermarks demand TIMESTAMP (not the table's TIMESTAMP_NTZ), so
    # the join axis is a session-tz cast (the session factory and the
    # driver both pin UTC, making it the identical instant; both sides
    # cast identically either way, so the |Δt| arithmetic is unmoved)
    # project BEFORE the join: every left column rides the join state
    # (the symmetric hash join buffers whole rows per key) — carrying
    # the full event schema incl. the props JSON string through state
    # is pure write amplification when the output needs only the ids
    left = (
        read_events_stream(spark, sf_dir)
        .select(
            "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts_wm")
        )
        .withWatermark("ts_wm", "30 days")
    )
    right = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").cast("timestamp").alias("r_ts"),
        )
        .withWatermark("r_ts", "30 days")
    )
    pairs = left.join(
        right,
        (F.col("user_id") == F.col("r_user"))
        & (F.col("r_id") != F.col("event_id"))
        & (
            F.col("r_ts")
            >= F.col("ts_wm") - F.expr(f"INTERVAL {_JOIN_RANGE_S} SECONDS")
        )
        & (
            F.col("r_ts")
            <= F.col("ts_wm") + F.expr(f"INTERVAL {_JOIN_RANGE_S} SECONDS")
        ),
        "inner",
    ).select("event_id", "r_id")
    # stream-static: events enriched with the customer dim (broadcast
    # per micro-batch; the stream side never shuffles)
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    enriched = (
        read_events_stream(spark, sf_dir)
        .join(cust, "user_id")
        .select("event_id", F.col("c_name").alias("k"), F.col("value").alias("v"))
    )
    q1, read_pairs = _drain_to_parquet(pairs, "stream_join_pairs")
    q2, read_enrich = _drain_to_parquet(enriched, "stream_join_enrich")
    q1.awaitTermination()
    q2.awaitTermination()
    record_bounded_run("stream_join_suite", q1)
    record_bounded_run("stream_join_suite", q2)
    near = (
        read_pairs()
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
        .select(
            F.lit("near_errors").alias("variant"),
            "event_id",
            F.lit(None).cast("string").alias("k"),
            "v",
        )
    )
    enrich = read_enrich().select(
        F.lit("enrich").alias("variant"), "event_id", "k", "v"
    )
    return near.unionAll(enrich)


# --- custom stateful operator (applyInPandasWithState) ---------------------

#: per-process cache of the multi-file replay source for
#: stream_running_totals, keyed by (applicationId, sf_dir) — same
#: immutable-input posture as similarity._INDEX_PATHS: the testdata
#: under one sf_dir never changes within an application, so the
#: projected copy is written once and replayed by every call.
_RT_SRC_CACHE: dict[tuple[str, str], str] = {}

_RT_FILES = 4  # replay files -> guaranteed micro-batch count


def _running_totals_source(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events table as _RT_FILES parquet files of
    (key, cents) — user_id as string key, value in exact integer
    cents (the testdata's values are exact 2-decimal currency; cents
    make the cross-batch accumulation integer-exact, where a float
    running sum would drift with batch order). Streaming this copy
    with maxFilesPerTrigger=1 forces >= _RT_FILES micro-batches, so
    the state store genuinely carries totals across batches."""
    from ..tmpdirs import scratch_dir

    cache_key = (spark.sparkContext.applicationId, sf_dir)
    path = _RT_SRC_CACHE.get(cache_key)
    if path is None:
        path = scratch_dir("running_totals_src_")
        (
            read_table(spark, sf_dir, "events")
            .select(
                F.col("user_id").cast("string").alias("key"),
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            .repartition(_RT_FILES)
            .write.mode("overwrite")
            .parquet(path)
        )
        _RT_SRC_CACHE[cache_key] = path
    return path


@register(
    "stream_running_totals",
    oracle="""
        SELECT CAST(user_id AS VARCHAR) AS key,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM events
        GROUP BY user_id
    """,
)
def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator (streaming/stateful.running_totals,
    applyInPandasWithState) driver-gated: per-user cumulative byte
    totals carried in the streaming state store across micro-batches —
    the running-counter semantics a watermarked window cannot express
    (the total never closes). The events table replays as four files
    with maxFilesPerTrigger=1, so the replay is guaranteed multiple
    micro-batches and every key's final total is accumulated state,
    not a single-batch sum (cross-batch arithmetic + restart recovery
    are pinned in tests/test_stateful.py). Each key emits its updated
    total once per micro-batch that touches it (update mode); the
    LAST emission per key — row_number over n_updates, the same
    WindowGroupLimit top-1 as latest_event_per_user — is the final
    total, which must equal the batch GROUP BY sum: the oracle
    hash-proves the state path loses/duplicates no update. Values
    ride as exact integer cents so the cumulative sum is
    batch-order-independent.

    100 TB shape: state is hash-partitioned by key across executors,
    per-key memory is one (long, long) pair, and idle keys would be
    evicted by GroupStateTimeout in an unbounded deployment. The
    memory sink here is the bounded-verification harness only; a
    production stream emits updates through foreachBatch into a keyed
    upsert sink (streaming/sinks.py)."""
    from pyspark.sql import Window

    from ..streaming.stateful import running_totals

    spark = _bounded_session(spark, partitions=_RT_STATE_PARTITIONS)
    src_path = _running_totals_source(spark, sf_dir)
    src = (
        spark.readStream.schema("key string, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    totals = running_totals(src, key_col="key", value_col="cents")
    q = (
        totals.writeStream.format("memory")
        .queryName("stream_running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    record_bounded_run("stream_running_totals", q)
    emissions = spark.table("stream_running_totals")
    w = Window.partitionBy("key").orderBy(F.col("n_updates").desc())
    return (
        emissions.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("key", F.col("total").alias("total_cents"))
    )
