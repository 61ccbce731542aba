"""Structured Streaming pipelines over the events schema.

The reference is strictly batch (SURVEY.md §2.9: no watermarks, no
windows, no stateful operators anywhere in /root/reference); its closest
concept is the incremental materialization's high-water-mark micro-batch
(reference: README.md:503-547). These pipelines are the engine's streaming
*extension*: the same logical aggregations as the batch catalog
(events_hourly, events_incremental_batch) expressed as incremental
streaming plans, so a user can swap batch ↔ streaming without rewriting
semantics.

Scale notes: watermark + windowed aggregation keeps state bounded (late
rows beyond the watermark dropped); `availableNow` triggers give Kappa-
style backfill over historic parquet with the same code. State-store
shuffle partitioning follows spark.sql.shuffle.partitions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Static-side ledger caches for stream-static anti-joins (the frontier
# pipelines). Deliberately NOT dedup's bounded-LRU registry: a live
# stream re-reads its static side EVERY micro-batch, so a registry
# eviction mid-stream (any _persist-heavy batch operator interleaving)
# would silently fall back to recomputing the decode-bearing ledger
# lineage per trigger — the exact per-trigger re-decode the eager
# materialization exists to prevent (r11 ADVICE). This registry never
# evicts; lifetime is caller-owned via release_static_caches() once the
# stream is stopped. Footprint is ledger-sized (8-24 bytes per known
# class), not corpus-sized.
_STATIC_CACHES: list[DataFrame] = []


def _persist_static(df: DataFrame) -> DataFrame:
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _STATIC_CACHES.append(out)
    return out


def release_static_caches() -> int:
    """Unpersist every static-side ledger cache created by this module's
    frontier pipelines. Call AFTER stopping the streams that use them —
    a still-running stream would recompute its ledger lineage (decode
    included) on every subsequent micro-batch."""
    n = 0
    while _STATIC_CACHES:
        try:
            _STATIC_CACHES.pop().unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return n


def _with_event_time_watermark(
    df: DataFrame, ts_col: str, watermark: str
) -> DataFrame:
    """``withWatermark`` that tolerates TIMESTAMP_NTZ event time.

    Spark's watermark requires a TIMESTAMP column
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ); Spark 4's parquet
    inference can hand streaming readers NTZ for tz-less files. Cast is a
    no-op on already-TIMESTAMP columns and, with the session tz pinned
    UTC, value-preserving on NTZ — the single normalization point for
    every streaming pipeline's event-time column.
    """
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def hourly_event_counts_stream(
    events_stream: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the batch ``events_hourly`` catalog query:
    tumbling event-time window + late-data watermark."""
    return (
        _with_event_time_watermark(events_stream, "ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def ohlc_stream(
    events_stream: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``timeseries.ohlc_bars``: per-series tumbling
    event-time OHLC bars with a late-data watermark.

    open/close use the same ``min_by``/``max_by`` over the
    (ts, event_id) total order as the batch operator — both are
    declarative aggregates, so the state store carries one partial
    (6 fields) per open (series, window) group and merges micro-batches
    associatively, exactly like the batch map-side combine. Sum-free
    (order statistics + count), so the Kappa equivalence to the batch
    oracle is float-exact.
    """
    src = _with_event_time_watermark(events_stream, "ts", watermark)
    order = F.struct(F.col("ts"), F.col("event_id"))
    v = F.col("value").cast("double")
    return (
        src.select(
            "event_type", "ts", v.alias("__v"), order.alias("__o")
        )
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min_by("__v", "__o").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", "__o").alias("close"),
            (F.max("__v") - F.min("__v")).alias("hl_range"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("bar_hour"),
            "open",
            "high",
            "low",
            "close",
            "hl_range",
            "n_events",
        )
    )


def sessionize_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based), the canonical stateful
    streaming operator the reference cannot express at all.

    ``watermark=None`` disables late-data eviction (requires ``complete``
    output mode downstream): session windows drop input older than the
    watermark even in complete mode, so a historical backfill whose files
    arrive out of event-time order (the Kappa reprocessing shape) must run
    unwatermarked to reproduce batch sessionization exactly. Live
    pipelines keep the watermark — that is what bounds state.
    """
    if watermark is None:
        src = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        src = _with_event_time_watermark(events_stream, "ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def user_activity_tracker(
    events_stream: DataFrame,
    inactivity_timeout_ms: int = 30 * 60 * 1000,
):
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    activity accumulator that emits a summary row when the user goes quiet.

    State per user: (n_events, total_value, first/last event time). Each
    micro-batch folds its rows into state; a processing-time timeout
    flushes the user's summary and clears state. This is the operator
    class Spark's built-in aggregations can't express (custom emission
    policy + custom state shape) — the reference has no streaming at all
    (SURVEY §2.9).

    State size: O(active users) × ~48 bytes — bounded by the timeout.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("first_ts_ms", LongType()),
            StructField("last_ts_ms", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("tot", DoubleType()),
            StructField("first_ms", LongType()),
            StructField("last_ms", LongType()),
        ]
    )

    def track(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, tot, first_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                [[key[0], n, tot, first_ms, last_ms]], columns=out_schema.names
            )
            return
        n, tot, first_ms, last_ms = (state.get if state.exists else (0, 0.0, None, None))
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            n += len(pdf)
            tot += float(pdf["value"].sum())
            first_ms = min([m for m in [first_ms, *ts_ms] if m is not None])
            last_ms = max([m for m in [last_ms, *ts_ms] if m is not None])
        state.update((n, tot, first_ms, last_ms))
        state.setTimeoutDuration(inactivity_timeout_ms)
        if False:
            yield  # make this a generator on the non-timeout path too

    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def merge_stream_sink(
    source_stream: DataFrame,
    spark,
    target_path: str,
    checkpoint: str,
    unique_key: list[str],
    dedup_source_on: str | None = None,
):
    """Streaming upsert: foreachBatch → merge_upsert into a parquet target.

    The streaming twin of the engine's incremental/merge strategy: each
    micro-batch merges into the target with latest-wins semantics
    (``dedup_source_on`` = precombine column for intra-batch duplicates).
    On Delta/Iceberg the body becomes a native ``MERGE INTO``; on plain
    parquet each batch rewrites the (compacted) target — correct, and the
    size trade-off is the same one documented in SCALE.md §incremental.
    """
    import os

    from dbt_glue_spark.operators.merge import merge_upsert

    def latest_wins(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        rn = F.row_number().over(
            W.partitionBy(*unique_key).orderBy(F.desc(dedup_source_on))
        )
        return df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        data_dir = os.path.join(target_path, "data")
        if batch_df.isEmpty():
            return
        try:
            target = spark.read.parquet(data_dir)
            exists = True
        except Exception:  # first batch — no target yet
            exists = False
        if dedup_source_on is not None:
            # precombine semantics compare against the TARGET's value too
            # (an out-of-order batch must not clobber a newer target row):
            # union + keep-latest per key, like Hudi's upsert path.
            merged = latest_wins(
                target.unionByName(batch_df) if exists else batch_df
            )
        elif exists:
            merged = merge_upsert(target, batch_df, unique_key)
        else:
            merged = batch_df
        staged = merged.localCheckpoint(eager=True)  # don't read+overwrite same files
        staged.write.mode("overwrite").parquet(data_dir)

    return (
        source_stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def incremental_stream_sink(
    events_stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_hours: bool = True,
):
    """Streaming incremental-append materialization: the streaming twin of
    the engine's incremental/append strategy. Returns the (started)
    StreamingQuery; ``availableNow`` processes the full backlog then stops,
    which is exactly a driver-triggered incremental batch run."""
    out = events_stream
    if partition_hours:
        out = out.withColumn("event_hour", F.date_trunc("hour", "ts"))
    writer = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    return writer.start()


def click_purchase_join_stream(
    clicks_stream: DataFrame,
    purchases_stream: DataFrame,
    horizon: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each click matched to same-user
    purchases within ``[click_ts, click_ts + horizon]`` event time.

    Both sides carry watermarks and the join condition bounds purchase_ts
    relative to click_ts from BOTH directions — that pair is what lets the
    state store evict rows (unbounded stream-stream joins retain state
    forever and OOM; Spark enforces the time bound for exactly this
    reason). Inner rows emit as soon as both sides arrive; state for rows
    older than watermark+horizon is dropped. At scale, state is
    partitioned by the join key across the cluster's state stores.
    """
    # watermark=None → no state eviction (full-history join): required for
    # an out-of-event-time-order backfill, same trade as sessionize_stream
    def _wm(df: DataFrame) -> DataFrame:
        if watermark is None:
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return _with_event_time_watermark(df, "ts", watermark)

    c = _wm(clicks_stream).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = _wm(purchases_stream).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def dedup_stream(
    events_stream: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within the
    watermark window — the at-least-once → effectively-once repair step in
    front of any streaming sink.

    ``dropDuplicatesWithinWatermark`` keys the state store on ``keys`` and
    expires entries once the watermark passes them, so state is bounded by
    (arrival rate × watermark) instead of growing with the stream's
    lifetime — the property that makes streaming dedup viable at all.
    Batch twin: ``df.dropDuplicates(keys)``.
    """
    return _with_event_time_watermark(
        events_stream, ts_col, watermark
    ).dropDuplicatesWithinWatermark(keys)


def image_frontier_stream(
    media_stream: DataFrame,
    seen_hashes: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Streaming perceptual-image frontier — the Kappa twin of
    image_dhash_dedup applied at INGESTION: as scraped images stream in,
    each micro-batch is decoded+dHashed (the Arrow-batched mapInPandas
    stage runs per batch — stateless, so Structured Streaming supports
    it), anti-joined against the static seen-hash ledger, and each NEW
    perceptual class is emitted exactly once (dropDuplicates state keyed
    on the 8-byte hash). Re-scrapes and brightness-shifted re-encodes of
    already-ingested images never enter the corpus in the first place.

    ``seen_hashes`` is a ledger of dhash bigints (what a production
    deployment persists), not raw images. A stream-static join re-reads
    the static side EVERY micro-batch, so the distinct-hash projection is
    persisted and eagerly materialized here before the stream starts:
    if the caller hands a ledger whose lineage includes a decode (e.g.
    an ``image_dhash`` pipeline), the decode runs exactly once instead
    of once per trigger. The cached frame is 8 bytes per known class —
    footprint is negligible; it lives in the module's never-evicting
    stream-static registry (``release_static_caches()`` reclaims it once
    the stream is stopped).

    Undecodable/NULL rows are dropped here; the ingest-side decode
    census is the batch decode_audit's job.

    Batch twin: distinct ok-hashes of the stream's media minus the
    ledger's — the emitted set must equal it exactly regardless of file
    arrival order (tested).
    """
    from dbt_glue_spark.extensions.multimodal_dedup import image_dhash

    hashes = (
        image_dhash(media_stream, content_col, id_col)
        .filter(F.col("status") == "ok")
        .select("dhash")
    )
    # _persist_static (not dedup._persist): the bounded-LRU registry can
    # evict this frame mid-stream (r11 ADVICE — nothing enforces the
    # availableNow assumption the old comment leaned on), silently
    # re-running the ledger lineage per micro-batch; the stream-static
    # registry never evicts and is reclaimed by release_static_caches()
    # once the caller stops the stream
    seen = _persist_static(seen_hashes.select("dhash").distinct())
    seen.count()  # materialize NOW — micro-batches hit the cache
    return (
        hashes.join(seen, "dhash", "left_anti")
        .dropDuplicates(["dhash"])
    )


def embedding_frontier_stream(
    vec_stream: DataFrame,
    seen_buckets: DataFrame,
    vec_col: str = "embedding",
    planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Streaming embedding-space frontier — the Kappa twin of LSH
    sign-bucketing applied at INGESTION: as embedding rows stream in,
    each is projected to its deterministic hyperplane sign-bucket (a
    map-only Catalyst expression — stateless, stream-safe, no Python),
    anti-joined against the static seen-bucket ledger, and each NEW
    bucket is emitted exactly once (dropDuplicates state keyed on the
    ``planes``-char bucket string). The monitoring stream a curation
    pipeline runs to notice the corpus entering a NEW region of
    embedding space (new topic/language/modality mix) the moment it
    arrives, rather than at the next batch re-cluster.

    ``seen_buckets`` is a ledger of bucket strings (what a production
    deployment persists — ≤ 2^planes rows); its distinct projection is
    persisted and eagerly materialized in the stream-static registry
    (see :func:`image_frontier_stream` — same eviction rationale).

    NULL vectors are dropped here (no geometry; the census of missing
    embeddings is the batch audit's job).

    Batch twin: distinct buckets of the stream's vectors minus the
    ledger's — the emitted set must equal it exactly regardless of file
    arrival order (tested).
    """
    from dbt_glue_spark.extensions.similarity import sign_bucket

    buckets = vec_stream.filter(F.col(vec_col).isNotNull()).select(
        sign_bucket(F.col(vec_col), dim, planes).alias("bucket")
    )
    # stream-static registry, not the bounded LRU — same eviction
    # rationale as image_frontier_stream above
    seen = _persist_static(seen_buckets.select("bucket").distinct())
    seen.count()  # materialize NOW — micro-batches hit the cache
    return (
        buckets.join(seen, "bucket", "left_anti")
        .dropDuplicates(["bucket"])
    )


def pair_frontier_stream(
    pairs_stream: DataFrame,
    seen_pairs: DataFrame,
    caption_col: str = "caption",
    content_col: str = "content",
    id_col: str = "pair_id",
) -> DataFrame:
    """Streaming cross-modal pair frontier — the Kappa twin of joint
    (caption, image) dedup applied at INGESTION: as scraped image-caption
    pairs stream in, each micro-batch is decoded+dHashed and the caption
    md5-keyed (the ``crossmodal.pair_signatures`` joint class), anti-
    joined against the static seen-pair ledger, and each NEW joint class
    (caption_key, dhash) is emitted exactly once (dropDuplicates state
    keyed on 16+8 bytes). A re-scraped pair — same caption, brightness-
    shifted re-encode of the same image — never enters the corpus.

    ``seen_pairs`` is a ledger of (caption_key binary, dhash bigint)
    rows; like :func:`image_frontier_stream`, the distinct projection is
    persisted and eagerly materialized before the stream starts, so a
    ledger lineage that includes a decode runs once, not per trigger.

    NULL-caption / non-ok-decode rows are dropped here (no joint class);
    the decode census is the batch decode_audit's job.

    Batch twin: distinct joint keys of the stream's pairs minus the
    ledger's — the emitted set must equal it exactly regardless of file
    arrival order (tested).
    """
    from dbt_glue_spark.extensions.crossmodal import pair_signatures

    keys = pair_signatures(
        pairs_stream, caption_col, content_col, id_col
    ).select("caption_key", "dhash")
    # stream-static registry, not the bounded LRU — same eviction
    # rationale as image_frontier_stream above (r11 ADVICE)
    seen = _persist_static(seen_pairs.select("caption_key", "dhash").distinct())
    seen.count()  # materialize NOW — micro-batches hit the cache
    return (
        keys.join(seen, ["caption_key", "dhash"], "left_anti")
        .dropDuplicates(["caption_key", "dhash"])
    )


def mixture_monitor_stream(
    pairs_stream: DataFrame,
    kind_col: str = "pair_type",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Streaming modality-mixture monitor — the ingestion-side census
    behind ``crossmodal.modality_mixture_card``: as pairs stream in,
    maintain the per-pair-type token totals (complete-mode stateful
    aggregation; state is ONE row per pair type, bounded by the type
    alphabet, never the stream length). A mixture-aware ingestion
    compares the emitted totals against its target weights each trigger
    and alerts when the arriving mixture drifts — the Kappa twin of the
    batch card's census stage (the allocator stays batch: a global
    budget has no streaming meaning).

    NULL pair types are excluded (the allocator's stratified NULL
    contract); NULL token counts coalesce to 0.

    Batch twin: ``df.groupBy(kind).sum(tokens)`` — the final table must
    equal it exactly regardless of file arrival order (tested).
    """
    return (
        pairs_stream.filter(F.col(kind_col).isNotNull())
        .groupBy(kind_col)
        .agg(
            F.coalesce(F.sum(F.col(tokens_col).cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("n_tokens")
        )
    )


def url_frontier_stream(
    url_stream: DataFrame,
    ledger: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Streaming crawl-frontier dedup — the Kappa twin of
    web.url_frontier_new: canonicalize URLs as they arrive, drop
    everything the static seen-URL ledger already covers (stream-static
    LEFT ANTI join — the static side is re-read per micro-batch, so a
    ledger refreshed between batches is picked up), then dedup within
    the stream itself so each NEW canonical URL is emitted exactly once.

    State is the dropDuplicates store keyed on the canonical URL —
    bounded by |new URLs in the stream's lifetime|; a production
    deployment bounds it with dropDuplicatesWithinWatermark on an
    arrival-time column (the dedup_stream pattern) and periodically
    folds emitted URLs back into the ledger (the minhash_band_ledger
    compaction discipline).

    Batch twin: ``web.url_frontier_new(batch, ledger)`` — the emitted
    set must equal the batch operator's canon_url set exactly.
    """
    from dbt_glue_spark.extensions.web import canonical_url

    seen = (
        ledger.filter(F.col(url_col).isNotNull())
        .select(canonical_url(F.col(url_col)).alias("canon_url"))
        .distinct()
    )
    return (
        url_stream.filter(F.col(url_col).isNotNull())
        .select(canonical_url(F.col(url_col)).alias("canon_url"))
        .join(seen, "canon_url", "left_anti")
        .dropDuplicates(["canon_url"])
    )


def response_frontier_stream(
    turns_stream: DataFrame,
    ledger: DataFrame,
    role: str = "assistant",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Streaming assistant-response dedup — the Kappa twin of
    chat.response_dedup applied at INGESTION: as SFT conversations
    stream in, each ``role`` turn's text hash is emitted exactly once,
    and never if the static seen-response ledger already covers it
    (stream-static LEFT ANTI join, static side re-read per micro-batch).
    The canned-reply/template-answer mass that response_dedup finds
    after the fact never enters the corpus in the first place.

    State is the dropDuplicates store keyed on the 16-byte md5 —
    bounded by |new distinct responses|; a production deployment bounds
    it with dropDuplicatesWithinWatermark on an arrival-time column and
    periodically folds emitted hashes back into the ledger (the
    url_frontier_stream discipline, applied to turn content).

    Batch twin: distinct md5 of the stream's ``role`` turns minus the
    ledger's — the emitted set must equal it exactly regardless of file
    arrival order.
    """
    seen = (
        ledger.filter(
            (F.col(role_col) == role) & F.col(text_col).isNotNull()
        )
        .select(F.unhex(F.md5(F.col(text_col))).alias("__h"))
        .distinct()
    )
    return (
        turns_stream.filter(
            (F.col(role_col) == role) & F.col(text_col).isNotNull()
        )
        .select(F.unhex(F.md5(F.col(text_col))).alias("__h"))
        .join(seen, "__h", "left_anti")
        .dropDuplicates(["__h"])
        .select(F.lower(F.hex("__h")).alias("resp_hash"))
    )


def enrich_stream(
    events_stream: DataFrame,
    dim: DataFrame,
    join_expr,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch of the stream is
    left-joined against a static (batch) dimension table.

    Stream-static joins are STATELESS — no watermark, no state store:
    each micro-batch simply joins against the static side, which Spark
    re-plans per batch (so a Delta/parquet dim picks up new files between
    batches). Broadcasting the dim keeps the join map-side: the stream
    partitioning is untouched, which at cluster scale means no shuffle is
    ever introduced into the streaming stage — the canonical pattern for
    attaching slowly-changing reference data (user → segment, id → nation)
    to a high-rate event stream.
    """
    return events_stream.join(F.broadcast(dim), join_expr, "left").select(
        events_stream["*"], *[dim[c] for c in dim_cols]
    )


def clean_documents_stream(docs) -> "DataFrame":
    """Streaming corpus cleaning: Gopher quality gate → keep-filter → PII
    redaction, composed as ONE stateless narrow stage (no state store, no
    watermark, no shuffle) — the shape that lets a landing-zone document
    stream be cleaned at ingest instead of in a nightly batch. Exactly
    equal to running the batch operators on the same rows (tested), since
    every rule is a pure per-row projection.
    """
    from dbt_glue_spark.extensions.text_analysis import pii_redact, quality_filter

    kept = quality_filter(docs, passthrough=("text",)).filter("keep")
    return pii_redact(kept)


def _ledger_latest(target_path: str):
    """Newest committed ledger version under ``{target_path}/data``.

    Ledger sinks commit each merged state as an immutable versioned
    directory ``data/g{gen:06d}b{batch_id:012d}`` (``.tmp`` suffix while
    being written). ``gen`` is the checkpoint GENERATION — it increments
    whenever the ledger is taken over by a new streaming checkpoint, so
    version names stay monotonically ordered even though foreachBatch
    batch_ids restart at 0 per checkpoint (generation-major,
    zero-padded, so lexicographic name order == commit order). Returns
    ``(path, gen, batch_id)`` of the newest committed version, or
    ``(None, -1, -1)`` if no version exists yet. The embedded batch id
    is the per-generation idempotency watermark: a replayed micro-batch
    (foreachBatch is at-least-once) carries a batch_id ≤ the stored one
    in the SAME generation and is skipped instead of merged twice.
    """
    import os

    root = os.path.join(target_path, "data")
    try:
        names = os.listdir(root)
    except OSError:
        return None, -1, -1
    best = None
    best_key = (-1, -1)
    for name in names:
        key = _parse_version(name)
        if key is None:
            continue
        if key > best_key:
            best_key, best = key, os.path.join(root, name)
    return best, best_key[0], best_key[1]


_VERSION_RE = re.compile(r"^g(\d{6})b(\d{12})$")
_LEGACY_VERSION_RE = re.compile(r"^b(\d{12})$")


def _parse_version(name: str):
    """Parse a ledger version dir name → (gen, batch_id), or None.

    Accepts the current ``g{gen:06d}b{batch_id:012d}`` format AND the
    pre-generation legacy ``b{batch_id:012d}`` (mapped to generation 0),
    so a ledger written before the format change is still readable and
    GC-able instead of silently reading as "no ledger" — which the
    empty-stream fallbacks would then misreport as zero state. The match
    is a strict full-name regex (separator AND field widths), so a stray
    directory like ``g00000100`` or ``g000001x000000000005`` can never be
    returned as the latest ledger or garbage-collected as a version.
    """
    m = _VERSION_RE.match(name)
    if m:
        return int(m.group(1)), int(m.group(2))
    m = _LEGACY_VERSION_RE.match(name)
    if m:
        return 0, int(m.group(1))
    return None


def _ledger_commit(df: DataFrame, target_path: str, gen: int, batch_id: int) -> None:
    """Atomically publish a new ledger version for (gen, batch_id).

    Writes to ``g{gen}b{id}.tmp`` then renames — a single-dirent rename,
    so readers (and a crashed retry of the same batch) never see a
    half-written ledger, and the version being READ by the merge plan is
    never the directory being overwritten (the r4 sinks overwrote the
    dir they were lazily reading; an executor failure mid-write could
    lose the ledger). Old versions are garbage-collected keeping the
    previous one, so an in-flight reader of version N-1 survives the
    commit of N.
    """
    import os
    import shutil

    root = os.path.join(target_path, "data")
    os.makedirs(root, exist_ok=True)
    final = os.path.join(root, f"g{gen:06d}b{batch_id:012d}")
    tmp = final + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    committed = sorted(
        (n for n in os.listdir(root) if _parse_version(n) is not None),
        key=_parse_version,
    )
    keep = set(committed[-2:])
    for name in os.listdir(root):
        # only version dirs (current or legacy format, incl. their .tmp
        # residue) are GC candidates — the _ckpt token and any future
        # sidecar files must survive
        versionish = _parse_version(name) is not None or (
            name.endswith(".tmp") and _parse_version(name[: -len(".tmp")]) is not None
        )
        if not versionish or name in keep:
            continue
        shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def read_ledger(spark, target_path: str) -> DataFrame:
    """Read the newest committed ledger version of a sketch stream sink."""
    path, _gen, _bid = _ledger_latest(target_path)
    if path is None:
        raise FileNotFoundError(f"no committed ledger under {target_path}/data")
    return spark.read.parquet(path)


def read_ledger_or(spark, target_path: str, fallback: DataFrame) -> DataFrame:
    """read_ledger with an empty-stream contract: an EMPTY source stream
    commits no ledger at all, and the sketch of nothing is ``fallback``
    (a typed empty frame built by the caller), not a read error. Keeps
    the contract in one place for every sketch-reading query."""
    try:
        return read_ledger(spark, target_path)
    except FileNotFoundError:
        return fallback


_INSTANCE_MARKER = ".dgs-instance"


def _read_instance(checkpoint: str) -> str | None:
    """Read this checkpoint instance's minted fallback identity, or None
    if no fallback identity was ever minted (see :func:`_mint_instance`).
    The marker lives INSIDE the checkpoint directory, so it dies with
    the instance by construction — a checkpoint deleted and recreated at
    the same path starts markerless."""
    import os

    try:
        with open(os.path.join(checkpoint, _INSTANCE_MARKER)) as fh:
            return fh.read().strip() or None
    except OSError:
        return None


def _mint_instance(checkpoint: str) -> str:
    """Fallback identity of this checkpoint INSTANCE: a random token
    minted once into a marker file inside the checkpoint directory
    (unique tmp + atomic hard-link commit: the first minter wins and
    every concurrent minter converges on the winner's token).

    Instance-scoped on purpose: a checkpoint DELETED AND RECREATED at
    the same path is a different stream (its batch counter restarts at 0
    and its history is re-delivered from scratch), so it must NOT
    inherit the previous instance's watermark. A path hash — or even a
    path+inode hash, since common filesystems recycle inode numbers
    immediately — would alias the two, and a ``reset_on_takeover`` sink
    would then silently skip the new stream's early batches and merge
    the rest into stale pre-restart state. The marker file cannot alias
    them: it is deleted with the directory.

    Commit ladder (ADVICE r6: link-unsupported ≠ read-only): hard-link
    first; where the store refuses link() but is otherwise writable
    (some FUSE/object-store mounts: EPERM/ENOTSUP), fall back to an
    O_CREAT|O_EXCL exclusive create of the marker itself — still
    first-writer-wins, losers poll the winner's bytes. Only when the
    store refuses even a plain write (read-only — in which case Spark's
    own commit protocol is failing too) does this degrade, WITH a
    logged warning, to the md5 of the symlink-resolved real path, which
    still never splits one instance into two identities but can alias a
    deleted-and-recreated checkpoint."""
    import hashlib
    import os
    import time
    import uuid

    existing = _read_instance(checkpoint)
    if existing is not None:
        return existing
    token = uuid.uuid4().hex
    marker = os.path.join(checkpoint, _INSTANCE_MARKER)
    # first-writer-wins: hard-link a fully-written unique tmp onto the
    # marker name. link() is atomic and REFUSES an existing target, so
    # (a) concurrent minters cannot interleave writes into one tmp path
    # (each tmp is token-suffixed) and (b) exactly one minter's token
    # becomes the marker — the losers read the winner's value, which is
    # complete by construction (linked after the write closed). A
    # replace()-based commit would let a loser overwrite the winner
    # AFTER the winner re-read its own value, splitting one instance
    # into two identities.
    def _path_hash() -> str:
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint store at %s refuses writes; degrading instance "
            "identity to a path hash — a deleted-and-recreated checkpoint "
            "at this path would alias its predecessor",
            checkpoint,
        )
        return hashlib.md5(os.path.realpath(checkpoint).encode()).hexdigest()

    tmp = marker + "." + token
    try:
        with open(tmp, "w") as fh:
            fh.write(token)
    except OSError:
        # the store refuses even a plain create → read-only; last resort
        return _path_hash()
    try:
        try:
            os.link(tmp, marker)
        except FileExistsError:
            pass  # lost the race — the winner's marker is authoritative
        except OSError:
            # link-unsupported but writable store (FUSE/object mounts:
            # EPERM/ENOTSUP): exclusive-create the marker itself. Unlike
            # the link commit this publishes BEFORE the bytes land, so
            # losers poll until the winner's write is visible.
            try:
                fd = os.open(marker, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
                try:
                    os.write(fd, token.encode())
                    os.fsync(fd)
                finally:
                    os.close(fd)
            except FileExistsError:
                for _ in range(500):  # winner's 32 bytes land in ~µs
                    if _read_instance(checkpoint):
                        break
                    time.sleep(0.002)
            except OSError:
                return _path_hash()
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass
    return _read_instance(checkpoint) or token


class _CkptToken:
    """Stable identity of the streaming checkpoint that owns the ledger.

    foreachBatch batch_ids are PER-CHECKPOINT counters, not a property of
    the data: a stream restarted with a fresh checkpoint over the same
    target restarts at batch 0. The batch_id watermark alone would then
    misread every new batch as a replay and silently drop it. Stamping
    the ledger with the checkpoint's identity scopes the watermark: only
    a batch from the SAME checkpoint with batch_id ≤ stored is a replay.

    Identity source, in order: the query id Spark stores in the
    checkpoint's own ``metadata`` file (written at stream start, stable
    across restarts, independent of how the path is spelled), falling
    back to an instance token minted into a marker file inside the
    checkpoint directory itself (see :func:`_mint_instance`). A path
    hash would conflate a deleted-and-recreated checkpoint with its
    predecessor and inherit a watermark that silently skips the new
    stream's restarted batch ids; the marker dies with the directory,
    so the two instances can never alias.

    The resolver is instantiated once per sink run and CACHES the first
    token it resolves from the metadata file. A transient read failure on
    a later batch therefore cannot mint a different identity mid-run —
    which a reset_on_takeover sink would misread as a checkpoint takeover
    and wipe the additive ledger with NO re-delivery to rebuild from (the
    real checkpoint is intact, so history is never replayed). If the
    metadata file EXISTS but cannot be read/parsed and nothing is cached
    yet, the batch fails (Spark retries it under the same batch_id)
    rather than falling back; the instance-hash fallback applies only
    while the metadata file does not exist at all, and is deliberately
    not cached so the real query id wins as soon as the file appears.

    That mid-run upgrade (instance token on batch 0, query id from
    batch 1 on — possible on stores with delayed metadata visibility)
    must NOT read as a takeover: a ledger committed under the instance
    token belongs to this same checkpoint. :meth:`aliases` exposes it so
    :func:`_takeover_state` can recognize it as self and upgrade the
    stored token in place instead of wiping an additive ledger that the
    intact checkpoint would never re-deliver history to rebuild. The
    alias is scoped to the INSTANCE (the marker dies with the
    directory): a checkpoint deleted and recreated at the same path does
    not alias-match, so it is correctly treated as a takeover — reset
    and rebuilt from its from-scratch re-delivery — instead of skipping
    its restarted batch ids against the dead instance's watermark.
    """

    def __init__(self, checkpoint: str) -> None:
        self.checkpoint = checkpoint
        self._token: str | None = None

    def __call__(self) -> str:
        import json
        import os

        if self._token is not None:
            return self._token
        meta = os.path.join(self.checkpoint, "metadata")
        try:
            with open(meta) as fh:
                qid = json.load(fh).get("id")
        except OSError:
            if os.path.exists(meta):
                raise  # existing metadata unreadable: fail the batch, never mint a second identity
            return _mint_instance(self.checkpoint)
        if not qid:
            # metadata without a query id: the minted instance token is
            # stable for this checkpoint instance, so it is a cacheable
            # identity
            self._token = _mint_instance(self.checkpoint)
        else:
            self._token = str(qid)
        return self._token

    def aliases(self) -> frozenset[str]:
        """Other tokens that denote THIS checkpoint instance: its minted
        fallback identity (see :func:`_mint_instance`), read-only — a
        run that resolved its query id directly never mints one. A
        stored token matching an alias is the same owner, not a
        takeover; a checkpoint recreated at the same path starts
        markerless, so its predecessor's fallback token deliberately
        does NOT alias-match."""
        m = _read_instance(self.checkpoint)
        return frozenset({m}) if m else frozenset()


def _read_token(target_path: str) -> tuple[str | None, int]:
    """Read ``(checkpoint_token, generation)`` from the ledger, or
    ``(None, -1)`` if no takeover has been recorded.

    A MISSING token file (fresh ledger, or one that predates tokens) is
    the only condition mapped to ``(None, -1)``. Any other read or parse
    failure raises, failing the micro-batch so Spark retries it under
    the same batch_id: silently mapping a transient EIO/EACCES — or a
    corrupt token, which the atomic tmp+rename write can never produce
    on its own — to "tokenless" would make a ``reset_on_takeover`` sink
    classify a healthy tokened ledger as legacy and wipe it with no
    re-delivery to rebuild from (the same absent-vs-unreadable
    distinction :class:`_CkptToken` draws for the checkpoint metadata)."""
    import os

    try:
        with open(os.path.join(target_path, "data", "_ckpt")) as fh:
            raw = fh.read().strip()
    except FileNotFoundError:
        return None, -1
    token, gen = raw.rsplit(":", 1)
    return token or None, int(gen)


def _write_token(target_path: str, token: str, gen: int) -> None:
    """Record that generation ``gen`` belongs to checkpoint ``token``.

    Atomic (tmp + rename) so a crash never leaves a torn token. Written
    BEFORE the generation's first version commit: if the process dies in
    between, the replayed batch sees a matching token whose generation
    has no committed version yet (latest gen < stored gen) and merges
    normally; the reverse order would let the replay double-merge an
    already-committed batch — and skipping on a bare token match would
    wrongly compare the new run's restarted batch ids against the OLD
    generation's watermark.
    """
    import os

    root = os.path.join(target_path, "data")
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, "_ckpt.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"{token}:{gen}")
    os.rename(tmp, os.path.join(root, "_ckpt"))


def _reset_ledger(target_path: str) -> None:
    """Wipe the ledger for an additive takeover — VERIFIED.

    A blind ``rmtree(ignore_errors=True)`` can partially fail (one
    undeletable file) and silently leave old committed version dirs on
    disk; a reader would then keep seeing stale pre-takeover state until
    the new generation's first commit. So every entry is deleted
    individually and the reset RAISES if a committed version survives —
    failing the micro-batch (Spark retries it under the same batch_id)
    instead of proceeding over a half-wiped ledger. Defense in depth:
    even if survivors slipped through, :func:`_takeover_state` continues
    the generation sequence ABOVE the pre-reset maximum, so new commits
    always out-order stale residue rather than being shadowed by it.

    The ownership record (``_ckpt``) is deleted LAST, only once every
    committed version is confirmed gone: a bulk delete that drops the
    token first and then fails on a version dir leaves a tokenless
    ledger with committed versions — which the original owner's resumed
    stream (takeover abandoned after the raise) would misclassify as a
    legacy ledger and destructively rebuild mid-stream.
    """
    import os
    import shutil

    root = os.path.join(target_path, "data")
    if not os.path.isdir(root):
        return
    survivors = []
    for name in os.listdir(root):
        if name == "_ckpt":
            continue  # ownership record goes last, see above
        path = os.path.join(root, name)
        try:
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
        except OSError:
            survivors.append(name)
    if any(_parse_version(n) is not None for n in survivors):
        raise RuntimeError(
            f"takeover reset left committed ledger versions under {root}: "
            f"{sorted(survivors)}"
        )
    try:
        os.remove(os.path.join(root, "_ckpt"))
    except FileNotFoundError:
        pass


def _takeover_state(
    target_path: str,
    token: str,
    batch_id: int,
    reset_on_takeover: bool,
    aliases: frozenset[str] = frozenset(),
) -> tuple[str | None, int, bool]:
    """The shared watermark/takeover protocol of every ledger sink.

    Returns ``(cur_path, commit_gen, skip)``:

    - ``skip`` — this batch_id is ≤ OUR OWN generation's committed
      watermark: an at-least-once replay, already merged, do nothing.
      The generation comparison matters: a matching token whose
      generation has no committed version yet (crash between token
      write and first commit) must NOT be compared against an older
      generation's batch ids — and for ADDITIVE sinks any version from
      another generation is pre-takeover state that must not be merged
      either (it is residue of that crash window or of a partially
      failed reset), so ``cur_path`` is cleared for them in that case.
    - ``aliases`` — alternate tokens that denote the SAME checkpoint
      instance (its minted fallback identity, per
      :meth:`_CkptToken.aliases`): a stored alias match is ownership,
      not takeover, and upgrades the stored token to the primary one in
      place.
    - takeover (stored token differs — or, for additive sinks, a
      committed ledger that predates tokens entirely: with no watermark
      scope there is no way to tell which re-delivered batches a legacy
      ledger already merged, so it is rebuilt exactly like a takeover,
      closing the one-time legacy double-merge window): start a new
      generation so the new checkpoint's restarted batch ids still
      commit as strictly newer versions. ``reset_on_takeover`` encodes
      the sink's merge algebra — ADDITIVE sinks (count-min, histogram)
      must rebuild from the re-delivered history, while idempotent SET
      merges (KMV) keep the ledger and union through.
    - the new generation is ``max(latest committed, stored) + 1`` — the
      sequence continues past wiped/uncommitted generations instead of
      restarting at 0, so commits stay monotonic even across a
      partially failed reset.
    - the token is recorded (atomically, BEFORE the generation's first
      commit) whenever it changes.
    """
    stored_token, stored_gen = _read_token(target_path)
    cur_path, gen, cur_id = _ledger_latest(target_path)
    if stored_token == token or (stored_token is not None and stored_token in aliases):
        if stored_token != token:
            # same checkpoint under its fallback-identity alias (the metadata
            # file became visible after the alias was recorded): same
            # owner, same generation — upgrade the stored token in
            # place; a reset here would discard merges the intact
            # checkpoint will never re-deliver
            _write_token(target_path, token, stored_gen)
        if gen == stored_gen:
            return cur_path, stored_gen, batch_id <= cur_id
        if reset_on_takeover:
            cur_path = None  # other-generation residue: never merge it additively
        return cur_path, stored_gen, False
    if reset_on_takeover and (stored_token is not None or cur_path is not None):
        _reset_ledger(target_path)
        cur_path = None
    commit_gen = max(gen, stored_gen) + 1
    _write_token(target_path, token, commit_gen)
    return cur_path, commit_gen, False


def countmin_stream_sink(
    source_stream: DataFrame,
    spark,
    target_path: str,
    checkpoint: str,
    col: str,
):
    """Streaming count-min maintenance: each micro-batch builds a sketch
    of its own rows and merges it CELL-WISE (+) into the persistent
    sketch. Count-min is linear — ``build(A ∪ B) = build(A) + build(B)``
    cell by cell — so on the failure-free path the streamed sketch equals
    the batch-built sketch no matter how the stream was batched or
    ordered. Because the merge is ADDITIVE, at-least-once redelivery
    would double-count without extra defense; the ledger therefore embeds
    the last merged batch_id in its version name and a replayed batch
    (batch_id ≤ stored, SAME checkpoint — the watermark is scoped by a
    checkpoint token, since batch ids restart per checkpoint) is skipped,
    making the sink idempotent end-to-end. A run under a NEW checkpoint
    against a warm ledger resets it and rebuilds from what the new run
    delivers — the only consistent additive answer: the old watermark
    says nothing about which of the re-delivered batches were merged.
    Versions commit via temp-dir + atomic rename (:func:`_ledger_commit`),
    so the ledger being read is never the directory being overwritten.
    Constant ~4 KB state for an unbounded stream; at cluster scale the
    same shape runs cross-pipeline: shards build sketches independently
    and a coordinator folds them cell-wise.
    """
    from dbt_glue_spark.extensions.sketches import countmin_build

    # constructed here, resolved lazily inside the batch — the metadata
    # file only exists once the stream starts (rules: _CkptToken doc)
    token_of = _CkptToken(checkpoint)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        token = token_of()
        cur_path, commit_gen, skip = _takeover_state(
            target_path, token, batch_id,
            reset_on_takeover=True, aliases=token_of.aliases(),
        )
        if skip:
            return  # at-least-once replay of an already-merged batch
        batch_sketch = countmin_build(batch_df, col)
        if cur_path is not None:
            merged = (
                spark.read.parquet(cur_path)
                .unionByName(batch_sketch)
                .groupBy("row_idx", "bucket")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            )
        else:
            merged = batch_sketch
        _ledger_commit(merged, target_path, commit_gen, batch_id)

    return (
        source_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def kmv_stream_sink(
    source_stream: DataFrame,
    spark,
    target_path: str,
    checkpoint: str,
    col: str,
    k: int = 256,
):
    """Streaming KMV distinct-count maintenance: each micro-batch's
    distinct md5-fraction hashes are set-unioned into a persistent ≤k-row
    hash ledger, keeping the k smallest. KMV merge is a SET operation —
    order-insensitive AND idempotent (a re-delivered value hashes to the
    same point, so at-least-once delivery cannot inflate the estimate,
    unlike additive sketches) — so the streamed ledger is EXACTLY the
    batch-built one no matter how the stream was batched, ordered, or
    retried. Constant O(k) state for an unbounded stream; the same union
    folds per-shard ledgers cross-pipeline (mergeable-sketch contract).
    Although the merge itself tolerates replays, the ledger still uses
    the versioned atomic commit (:func:`_ledger_commit`) so a crash
    mid-write can never lose the previous state, and replayed batches
    from the same checkpoint are skipped rather than re-unioned
    (cheaper, same result). Under a NEW checkpoint the skip is disabled
    — batch ids restarted, so early ids may carry new data — but no
    reset is needed: re-unioning re-delivered history is a no-op for a
    set merge, unlike the additive sinks.
    """
    from dbt_glue_spark.extensions.sketches import hash_fraction

    # constructed here, resolved lazily inside the batch — the metadata
    # file only exists once the stream starts (rules: _CkptToken doc)
    token_of = _CkptToken(checkpoint)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        token = token_of()
        # reset_on_takeover=False: re-unioning re-delivered history is a
        # set-merge no-op, so the ledger survives checkpoint loss intact
        cur_path, commit_gen, skip = _takeover_state(
            target_path, token, batch_id,
            reset_on_takeover=False, aliases=token_of.aliases(),
        )
        if skip:
            return  # at-least-once replay of an already-merged batch
        bh = batch_df.select(hash_fraction(F.col(col)).alias("h")).distinct()
        if cur_path is not None:
            merged = spark.read.parquet(cur_path).unionByName(bh).distinct()
        else:
            merged = bh
        topk = merged.orderBy(F.col("h").asc()).limit(k)
        _ledger_commit(topk, target_path, commit_gen, batch_id)

    return (
        source_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def histogram_stream_sink(
    source_stream: DataFrame,
    spark,
    target_path: str,
    checkpoint: str,
    col: str,
    bucket_width: int,
    n_buckets: int = 32,
):
    """Streaming histogram maintenance: each micro-batch's fixed-width
    bucket counts are merged cell-wise (+) into a persistent ≤ n_buckets-
    row parquet ledger. Histogram counting is linear, so on the
    failure-free path the streamed ledger equals the batch-built
    histogram no matter how the stream was batched or ordered; like the
    count-min sink the merge is ADDITIVE, so replayed micro-batches are
    detected by the batch_id embedded in the ledger version and skipped
    (idempotent under at-least-once delivery), and versions commit via
    temp-dir + atomic rename so a mid-write failure cannot lose the
    ledger. Constant state (≤ n_buckets rows) for an unbounded stream;
    the same fold merges per-shard histograms cross-pipeline.
    """
    from dbt_glue_spark.extensions.audit import value_histogram

    # constructed here, resolved lazily inside the batch — the metadata
    # file only exists once the stream starts (rules: _CkptToken doc)
    token_of = _CkptToken(checkpoint)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        token = token_of()
        cur_path, commit_gen, skip = _takeover_state(
            target_path, token, batch_id,
            reset_on_takeover=True, aliases=token_of.aliases(),
        )
        if skip:
            return  # at-least-once replay of an already-merged batch
        batch_hist = value_histogram(batch_df, col, bucket_width, n_buckets)
        if cur_path is not None:
            merged = (
                spark.read.parquet(cur_path)
                .unionByName(batch_hist)
                .groupBy("bucket")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            )
        else:
            merged = batch_hist
        _ledger_commit(merged, target_path, commit_gen, batch_id)

    return (
        source_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def priority_sample_stream_sink(
    source_stream: DataFrame,
    spark,
    target_path: str,
    checkpoint: str,
    key_col: str,
    weight_col: str,
    k: int = 256,
    seed: str = "7",
):
    """Streaming priority-sampling maintenance — the streaming twin of
    :func:`extensions.sampling.weighted_sample` (Duffield–Lund–Thorup):
    each micro-batch's bottom-(k+1) rows by the exact integer priority
    are set-unioned into a persistent ≤ (k+1)-row ledger, keeping the
    k+1 smallest overall.

    Bottom-k is ASSOCIATIVE (bottom-(k+1) of a union = bottom-(k+1) of
    per-part bottom-(k+1)s: every global survivor survives its own
    part), and the priority is a DETERMINISTIC function of the key —so
    like the KMV sink (and unlike additive sketches) the merge is a set
    operation, order-insensitive and idempotent under at-least-once
    redelivery: a replayed row reproduces its exact (key, weight,
    priority) triple and dies in ``distinct()``. The streamed ledger
    therefore equals the one-shot batch bottom-(k+1) no matter how the
    stream was batched, ordered, or retried — Kappa equivalence, gated
    by the batch-oracle parity of the staged ``streaming_priority_sample``
    query. Keys are assumed weight-stable (weight is a function of the
    key, the documents/doc_id/n_chars shape); a re-keyed weight would be
    two distinct rows, of which the lower-priority one simply competes.

    The ledger carries k+1 rows (not k) so τ — the (k+1)-th priority,
    which the unbiased subset-sum estimator needs — is always derivable
    from carried state alone (:func:`extensions.sampling.
    priority_sample_finalize`). Constant O(k) state for an unbounded
    stream; per-batch cost is one TakeOrderedAndProject over the batch
    plus a (2k+2)-row merge, never corpus-proportional.

    Like KMV: ``reset_on_takeover=False`` — under a NEW checkpoint the
    replay-skip is disabled (batch ids restarted), but re-unioning
    re-delivered history is a no-op for a set merge, so no reset is
    needed and the ledger survives checkpoint loss intact. Commits use
    the versioned atomic ledger protocol (:func:`_ledger_commit`).
    """
    from dbt_glue_spark.extensions.sampling import priority_frame

    # constructed here, resolved lazily inside the batch — the metadata
    # file only exists once the stream starts (rules: _CkptToken doc)
    token_of = _CkptToken(checkpoint)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        token = token_of()
        cur_path, commit_gen, skip = _takeover_state(
            target_path, token, batch_id,
            reset_on_takeover=False, aliases=token_of.aliases(),
        )
        if skip:
            return  # at-least-once replay of an already-merged batch
        bp = (
            priority_frame(batch_df, key_col, weight_col, seed)
            .orderBy(F.col("priority").asc(), F.col(key_col).asc())
            .limit(k + 1)
        )
        if cur_path is not None:
            merged = spark.read.parquet(cur_path).unionByName(bp).distinct()
        else:
            merged = bp
        topk = merged.orderBy(
            F.col("priority").asc(), F.col(key_col).asc()
        ).limit(k + 1)
        _ledger_commit(topk, target_path, commit_gen, batch_id)

    return (
        source_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
