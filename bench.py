"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query seconds.

Queries are forced with a noop-format write (full pipeline execution, no
driver-side collect bottleneck). First query pays JVM/codegen warmup; a
throwaway warmup query absorbs that so per-query numbers reflect steady
state.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
per-query MEDIAN plus the (max-min) spread: this box shows ±15-30 % noise
under load (SCALE.md), and a single-shot number cannot distinguish a real
regression from a scheduling hiccup. ``value`` is the sum of medians.
Sub-second queries automatically extend to $SPARK_GRAFT_BENCH_SUBSEC_REPS
reps (default 5) — at that scale the noise is the same order as the
median, and the extra samples make spread-vs-delta adjudication
mechanical straight from BENCH_DETAIL.json (``reps_used`` records the
actual count per query).

Output budget: the driver keeps only the last ~2.2 KB of stdout, and the
round-4 record was lost when the full JSON (medians + spread + errors)
outgrew that window. The stdout line is therefore LEAN — 2-dp medians,
compact separators, no spread/errors — and printed twice so the tail
always contains one complete copy; the full detail (3-dp medians, spread,
errors, reps) goes to the BENCH_DETAIL.json sidecar next to this script.
``value_r1_subset`` is the subtotal over the fixed 31-query set benched in
round 1, so every future BENCH_rN.json carries the baseline ratio directly
(r1 total for this subset: 41.059 s at sf0.1).

Box-drift immunity (round 9, probe choice settled round 10, I/O gap
found round 11): three fixed calibration probes run — a pure-CPU probe
(``calibration_s``), a shuffle-bound probe (``calibration_shuffle_s``)
and an I/O-bound scan probe (``calibration_scan_s``, diagnostic only —
round-11 forensics caught a disk-side degradation mode the two
range-based probes are blind to). The SHUFFLE probe is the
canonical normalizer: ``value_r1_subset_normalized`` divides the raw
subtotal by (calibration_shuffle_s / CALIBRATION_SHUFFLE_REF_S), because
the r1 subset is scheduler/exchange-bound and the CPU probe tracks
clock/turbo state and measurably OVER-corrects it (r9 measurement at the
probe definitions below; r9 verdict "Next round #4" directed this
choice). The shuffle reading is the MEDIAN over pre-run samples plus one
interleaved sample every 8 queries (round-10 finding: a single pre-run
median swung 3.4× across same-HEAD runs on a flapping box; the
interleaved median tracks the state the queries actually ran under —
per-sample values are recorded as ``calibration_shuffle_samples``). The
CPU probe stays recorded (``calibration_ratio``) for cross-round
continuity with r9's CPU-normalized numbers. The sidecar is
always round-stamped: ``BENCH_DETAIL_r{N}.json`` from $SPARK_GRAFT_ROUND
when set, else N is inferred as 1 + max(existing BENCH_r{N}.json) — the
driver always writes those, so official runs no longer depend on an env
var the driver never sets (r9 verdict "What's wrong #2"); the unstamped
name is a last-resort fallback when no BENCH_r files exist.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_glue_spark.plans.catalog import SPECS
from dbt_glue_spark.session import get_spark

# Headline set: the most expensive / representative operators.
HEADLINE = [
    "flagship_revenue_by_nation",
    "pricing_summary",
    "top_orders",
    "order_priority_count",
    "customer_order_distribution",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q21_waiting_suppliers",
    "window_top_orders_per_customer",
    "window_running_total",
    "json_extract_events",
    "events_hourly",
    "region_nation_rollup",
]
# Extension headliners are appended dynamically if present in the catalog.
EXTENSION_HEADLINE = [
    "ext_exact_dedup",
    "ext_minhash_lsh_pairs",
    "ext_dup_clusters",
    "ext_knn_bruteforce",
    "ext_text_stats",
    "ext_bm25_search",
    "ext_tfidf_top_terms",
    "ext_countmin_tokens",
    "ext_histogram_quantiles",
    "ext_bloom_prune",
    "ext_shard_packing",
    "ext_corpus_shuffle",
    "ext_quality_classifier",
    "ext_minhash_incremental",
    "ext_span_dedup",
    "ext_lm_score",
    "ext_wordpiece_doc_stats",
    "ext_mmr_rerank",
    "ext_dsir_weights",
    "ext_ngram_dup_fraction",
    "ext_kmv_source_overlap",
    "ext_encoding_audit",
    "ext_rrf_fusion",
    "ext_label_separation",
    "mat_merge_upsert",
    "mat_scd2_snapshot_check",
    "asof_join_clicks_purchases",
    "range_join_signup_purchases",
    # round-7 promoted heavyweights (staged in r6, parity-proven ×7 profiles)
    "ext_prefix_jaccard_join",
    "ext_basket_lift",
    "ext_triangle_parts",
    "ext_pareto_orders",
    "ext_pmi_pairs",
    "ext_weighted_sample",
    "ext_ks_distance",
    "ext_interval_islands",
    # round-8 promoted heavyweight (staged in r7, parity-proven ×7 profiles;
    # 17.8 s at the 32× weak-scaling point — the most expensive catalog op)
    "ext_exact_substring_spans",
]

# The exact 31 queries timed in round 1 (BENCH_r01.json) — the fixed
# baseline-comparable subset. Reported as ``value_r1_subset`` every round
# so cross-round ratios no longer need hand-assembly. r1 subtotal: 41.059 s.
R1_SUBSET = [
    "flagship_revenue_by_nation",
    "pricing_summary",
    "top_orders",
    "order_priority_count",
    "customer_order_distribution",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q21_waiting_suppliers",
    "window_top_orders_per_customer",
    "window_running_total",
    "json_extract_events",
    "events_hourly",
    "region_nation_rollup",
    "ext_exact_dedup",
    "ext_minhash_lsh_pairs",
    "ext_dup_clusters",
    "ext_knn_bruteforce",
    "ext_text_stats",
    "ext_bm25_search",
    "ext_tfidf_top_terms",
    "ext_countmin_tokens",
    "ext_histogram_quantiles",
    "ext_bloom_prune",
    "ext_shard_packing",
    "mat_merge_upsert",
    "mat_scd2_snapshot_check",
    "asof_join_clicks_purchases",
    "range_join_signup_purchases",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Pinned reference for the pure-CPU calibration probe, measured on an idle
# box at round-9 HEAD (median of 5 isolated reps). Cross-round ratios were
# getting confounded by ambient machine state at the ±0.05× level (the r8
# verdict burned a full adjudication cycle proving a 0.70×→0.78× drift was
# box state: unchanged control queries drifted +37–78 % across three
# same-HEAD sessions). value_r1_subset_normalized divides the raw subtotal
# by (calibration_s / CALIBRATION_REF_S), so a 20 %-slow box reads the same
# normalized ratio as an idle one. The probe is deterministic, in-memory,
# shuffle-free and I/O-free (xxhash64 over spark.range in whole-stage
# codegen across all cores) — it measures the box, not the code under test.
# r12 re-pin (r11 verdict item 2, "probes agree AND at-floor" — the
# standing rule the r11a pin violated: it took the FIRST calm window,
# and three later same-HEAD windows read ~9 % lower with CPU and
# shuffle agreeing). References now come from the r11 session's probe
# floor (BENCH_DETAIL_r11d.json, 2026-08-16: CPU 0.876, shuffle 0.883,
# agreement ~1 %). Cross-round step factors vs the r11 pins: CPU
# 0.876/0.968 = ×0.905, shuffle 0.883/0.989 = ×0.893 — apply these
# when comparing normalized values across the r11/r12 boundary (both
# DEFLATE normalized ratios ~10 % vs r11's conservative-high pins).
# KNOWN LIMIT (measured 2026-08-16, SCALE.md "probe I/O-blindness"):
# both probes are spark.range-based and I/O-free; a disk-side noisy
# neighbor slows parquet-scanning queries ~1.4× while both probes read
# calm — the scan probe below records that regime.
CALIBRATION_REF_S = 0.876
CALIBRATION_ROWS = 2_000_000_000

# Second calibration flavor (round-9 session-3): the pure-CPU probe
# tracks clock/turbo state, but the r1 subset is substantially
# scheduler/shuffle-bound — measured 2026-08-16, the CPU probe swung
# −25 % between sessions while the workload moved ~2 %, so the
# normalized ratio OVER-corrected (SCALE.md "calibration-probe
# caveat"). This probe times a fixed shuffle + multi-stage job (groupBy
# over spark.range across 32 partitions → 200 reducers) — the
# scheduler/exchange regime the subset actually lives in. Recorded as
# ``calibration_shuffle_s`` alongside the CPU probe; the reference
# below was pinned 2026-08-16 from an idle-box FULL BENCH run — the
# probe runs after the bench warmup inside the bench JVM, so the
# reference must come from that same context (a fresh-JVM 5-rep median
# read 0.627 vs 0.846 in-bench: JVM/memory context shifts this probe
# ~35 %, worth knowing when comparing). The same session's CPU probe
# read 0.815-0.83 vs its 1.01 reference, i.e. the two probes disagree
# ~20 % about "how fast is this box" — precisely why both are
# recorded. Future rounds can
# normalize against whichever probe's regime matches the adjudication
# at hand; the existing normalized metric keeps the CPU probe for
# continuity.
CALIBRATION_SHUFFLE_REF_S = 0.883  # r12 re-pin: r11d session-floor in-bench reading (see CPU pin note)
CALIBRATION_SHUFFLE_ROWS = 50_000_000

# Third calibration flavor (round 11): an I/O-BOUND probe. The CPU and
# shuffle probes are spark.range-based and never touch storage; round-11
# forensics caught a probe-invisible degradation mode — two same-HEAD
# runs both read raw r1-subset ~41 s (uniform 1.4× vs the r10 calm run
# on untouched queries) while the probes read 1.63× in one run and
# 0.96-1.0× in the other. The missing regime is the parquet scan path
# (page cache / disk contention). This probe re-reads a fixed table
# (lineitem at the bench sf_dir) end-to-end; recorded as
# ``calibration_scan_s`` for adjudication — DIAGNOSTIC ONLY, not a
# normalizer (its reference is valid for sf0.1). r12 pin (r11 verdict
# item 2): median of the three recorded interleaved in-bench runs,
# r11b/c/d = 0.203/0.204/0.193 — all three from calm-disk windows, so
# calibration_scan_s / 0.203 ≫ 1 reads "scan path degraded" (the
# regime that moved pricing_summary 1.55× while CPU+shuffle read calm).
CALIBRATION_SCAN_REF_S = 0.203


def _free_sidecar_name(repo_dir: str, sidecar_name: str) -> str:
    """First non-existing sidecar filename: the stamped name itself, then
    letter-suffixed siblings (…r12a.json, …r12b.json, …) so two same-round
    runs COEXIST instead of last-write-wins (r10 "What's wrong #3": the
    driver's official run overwrote the builder's committed
    close-certification run at the same stamped name). If ALL 27 stamped
    names are taken, fall back to a uuid-suffixed name rather than
    overwriting the 'z' sibling (r11 ADVICE: the loop used to fall through
    and reintroduce exactly the clobber this scheme exists to prevent)."""
    base, ext = os.path.splitext(sidecar_name)
    for suffix in [""] + [chr(c) for c in range(ord("a"), ord("z") + 1)]:
        candidate = f"{base}{suffix}{ext}"
        if not os.path.exists(os.path.join(repo_dir, candidate)):
            return candidate
    return f"{base}-{uuid.uuid4().hex[:8]}{ext}"


def calibration(spark, reps: int = 3) -> float:
    """Median wall-seconds of the fixed pure-CPU probe on this box."""
    samples = []
    for _ in range(reps):
        t0 = time.time()
        spark.range(0, CALIBRATION_ROWS, 1, 32).selectExpr(
            "sum(xxhash64(id, id * 2654435761) % 1000003) AS s"
        ).collect()
        samples.append(time.time() - t0)
    return statistics.median(samples)


def calibration_shuffle_once(spark) -> float:
    """One wall-seconds sample of the fixed shuffle-bound probe: one full
    exchange (hash aggregate over 100k groups) plus a second stage, so
    scheduler latency and shuffle machinery dominate, not arithmetic.

    Exposed single-shot because the probe is sampled INTERLEAVED with the
    benched queries (round-10 finding: a single pre-run 5-rep median
    swung 3.4× across same-HEAD runs on a flapping box, so one
    before-the-run reading can over-/under-correct the normalizer by
    ±35 %; a median over pre-run + interleaved samples tracks the box
    state the queries actually experienced)."""
    t0 = time.time()
    spark.range(0, CALIBRATION_SHUFFLE_ROWS, 1, 32).selectExpr(
        "id % 100003 AS k", "id"
    ).groupBy("k").count().selectExpr("sum(count * (k % 97)) AS s").collect()
    return time.time() - t0


def calibration_scan_once(spark, sf_dir: str) -> float:
    """One wall-seconds sample of the I/O-bound probe: full re-read of
    the largest testdata table + a one-column sum, so the parquet scan
    path (page cache, disk, decompression) dominates. ``REFRESH TABLE``
    semantics are not needed — the DataFrame is rebuilt each call so no
    Spark-side result cache hides the read; the OS page cache is
    DELIBERATELY left warm, matching the state the benched queries scan
    under (a disk-side neighbor shows up as cache eviction either way).
    """
    from dbt_glue_spark.sources.registry import load_table

    t0 = time.time()
    load_table(spark, sf_dir, "lineitem").selectExpr(
        "sum(l_extendedprice) AS s"
    ).collect()
    return time.time() - t0


def calibration_shuffle(spark, reps: int = 3) -> float:
    """Median wall-seconds of the shuffle-bound probe (pre-run form)."""
    samples = []
    for _ in range(reps):
        t0 = time.time()
        spark.range(0, CALIBRATION_SHUFFLE_ROWS, 1, 32).selectExpr(
            "id % 100003 AS k", "id"
        ).groupBy("k").count().selectExpr(
            "sum(count * (k % 97)) AS s"
        ).collect()
        samples.append(time.time() - t0)
    return statistics.median(samples)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    # keep the bench tail to timings: the remaining WindowExec warnings
    # all concern intentional tiny-frame windows (≤256-row sketch/seed
    # frames), not data-scale plans — those are plan-gated in tests
    spark.sparkContext.setLogLevel("ERROR")
    specs = SPECS()
    names = [n for n in HEADLINE + EXTENSION_HEADLINE if n in specs]
    # Spot-check filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those
    # queries (same warmup/reps methodology) for drift investigations.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        wanted = {q.strip() for q in only.split(",") if q.strip()}
        unknown = wanted - set(names)
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names not in the headline set: {sorted(unknown)}"
            )
        names = [n for n in names if n in wanted]
    # warmup: JVM + parquet footer caches for every table family the
    # headline set touches (orders/lineitem via flagship, documents via
    # text stats, embeddings via knn) so the first timed query of each
    # family doesn't pay one-off footer/codegen costs
    force(specs["flagship_revenue_by_nation"].fn(spark, sf_dir))
    force(specs["ext_text_stats"].fn(spark, sf_dir))
    force(specs["ext_knn_bruteforce"].fn(spark, sf_dir))
    # Box-state calibration: timed AFTER warmup (so it reflects the JVM
    # state the queries run in), BEFORE the queries (so their memory
    # pressure doesn't contaminate it).
    cal_reps = max(1, int(os.environ.get("SPARK_GRAFT_CAL_REPS", "3")))
    calibration_s = round(calibration(spark, cal_reps), 3)
    cal_ratio = round(calibration_s / CALIBRATION_REF_S, 3)
    # Shuffle probe (the round-10 canonical normalizer): pre-run samples
    # here, plus one INTERLEAVED sample every few queries inside the
    # timing loop — the final reading is the median over all of them, so
    # a box that flaps mid-run (observed 2026-08-16: a calm ~0.6 s state
    # and a degraded ~1.9 s state within one session) is normalized by
    # the state the queries actually ran under, not by one lucky or
    # unlucky pre-run reading.
    shuffle_samples = [calibration_shuffle_once(spark) for _ in range(cal_reps)]
    # I/O-bound probe (diagnostic; see CALIBRATION_SCAN_REF_S note):
    # sampled pre-run and interleaved exactly like the shuffle probe
    scan_samples = [calibration_scan_once(spark, sf_dir) for _ in range(cal_reps)]
    timings: dict[str, float] = {}
    from dbt_glue_spark.extensions.dedup import release_caches
    from dbt_glue_spark.streaming.pipelines import release_static_caches

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Sub-second rows get extra reps (default up to 5): at <1 s the box's
    # scheduling noise is the same order as the median itself, and 3
    # samples cannot mechanically separate a real drift from a hiccup —
    # the r5/r6 spread-watch adjudications all landed on "noise" after
    # isolated 11-rep runs. More samples per round makes that call
    # directly from BENCH_DETAIL.json without a separate isolated run.
    subsec_reps = max(
        reps, int(os.environ.get("SPARK_GRAFT_BENCH_SUBSEC_REPS", "5"))
    )
    spread: dict[str, float] = {}
    reps_used: dict[str, int] = {}
    errors: dict[str, str] = {}
    for qi, name in enumerate(names):
        # interleaved shuffle-probe sample every 8 queries (~0.6-0.9 s
        # each — a few seconds total over the full headline set)
        if qi and qi % 8 == 0:
            shuffle_samples.append(calibration_shuffle_once(spark))
            scan_samples.append(calibration_scan_once(spark, sf_dir))
        samples: list[float] = []
        # The sub-second extension is decided ONCE, after the first `reps`
        # samples (single median check): a query hovering at the 1 s
        # boundary must not get a round-dependent rep count, or its spread
        # values are computed over differing sample sizes across rounds and
        # the cross-round spread-vs-delta comparison loses its footing.
        # reps_used is therefore bistable: exactly `reps` or `subsec_reps`.
        target = reps
        while len(samples) < target:
            t0 = time.time()
            # Fault isolation: one broken query must not zero the whole
            # round's perf record — record the error, keep timing the rest.
            try:
                force(specs[name].fn(spark, sf_dir))
                samples.append(time.time() - t0)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                samples = []
                break
            # free executor storage between runs so one query's cached
            # intermediates don't skew the next one's memory budget
            # (both registries: dedup's bounded LRU AND the stream-static
            # ledgers — frontier specs' availableNow streams are finished
            # by the time force() returns, so their caches are releasable)
            release_caches()
            release_static_caches()
            if len(samples) == reps and statistics.median(samples) < 1.0:
                target = subsec_reps
        if samples:
            timings[name] = round(statistics.median(samples), 3)
            spread[name] = round(max(samples) - min(samples), 3)
            reps_used[name] = len(samples)
    total = round(sum(timings.values()), 2)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Canonical normalizer reading: median over pre-run + interleaved
    # shuffle-probe samples (see the collection comments above).
    calibration_shuffle_s = round(statistics.median(shuffle_samples), 3)
    cal_shuffle_ratio = round(
        calibration_shuffle_s / CALIBRATION_SHUFFLE_REF_S, 3
    )
    calibration_scan_s = round(statistics.median(scan_samples), 3)
    # Diagnostic (never a normalizer): how degraded the parquet scan path
    # reads vs the pinned calm-disk reference — ≫ 1 explains drift on
    # scan-bound queries (pricing_summary) that the CPU/shuffle probes miss.
    cal_scan_ratio = (
        round(calibration_scan_s / CALIBRATION_SCAN_REF_S, 3)
        if CALIBRATION_SCAN_REF_S
        else None
    )
    # r1_n marks subset completeness: if a subset query errored, the
    # subtotal covers fewer than 31 queries and is NOT comparable to the
    # 41.059 s r1 baseline — consumers must check r1_n == 31.
    r1_present = [n for n in R1_SUBSET if n in timings]
    r1_subtotal = round(sum(timings[n] for n in r1_present), 2)
    # Box-drift-immune subtotal: divide by how slow the box reads relative
    # to the pinned SHUFFLE-probe reference (canonical since round 10 —
    # the subset is exchange-bound; the CPU probe over-corrects). A
    # 20 %-slow box (ratio 1.2) normalizes back to idle-box terms; code
    # regressions still show.
    r1_normalized = (
        round(r1_subtotal / cal_shuffle_ratio, 2) if cal_shuffle_ratio > 0 else None
    )
    # Full-fidelity record → sidecar (spread/errors would blow the stdout
    # tail budget; see module docstring).
    detail = {
        "metric": "headline_queries_total_seconds",
        "value": total,
        "value_r1_subset": r1_subtotal,
        "value_r1_subset_normalized": r1_normalized,
        "calibration_s": calibration_s,
        "calibration_ratio": cal_ratio,
        "calibration_shuffle_s": calibration_shuffle_s,
        "calibration_shuffle_ratio": cal_shuffle_ratio,
        "calibration_shuffle_samples": [
            round(s, 3) for s in shuffle_samples
        ],
        "calibration_scan_s": calibration_scan_s,
        "calibration_scan_ratio": cal_scan_ratio,
        "calibration_scan_samples": [round(s, 3) for s in scan_samples],
        "r1_n": len(r1_present),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "reps": reps,
        "reps_used": reps_used,
        "sf": sf_val,
    }
    if errors:
        detail["errors"] = errors
    # Round-stamped sidecar (r8 "What's wrong #2", un-gated per r9 "What's
    # wrong #2"): $SPARK_GRAFT_ROUND=N wins when set, but the driver never
    # sets it — so infer N as 1 + max(existing BENCH_r{N}.json) (the driver
    # always writes those at round close, so during round N only
    # BENCH_r{N-1} and older exist). CAVEAT (r10 ADVICE): a spot-check run
    # made AFTER the driver writes BENCH_r{N}.json but before the round
    # actually rolls infers N+1 — post-close spot checks must set
    # SPARK_GRAFT_ROUND explicitly. Unstamped fallback only when no
    # BENCH_r files exist at all.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    round_tag = os.environ.get("SPARK_GRAFT_ROUND", "").strip()
    if not round_tag.isdigit():
        prior = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        round_tag = str(1 + max(prior)) if prior else ""
    sidecar_name = (
        f"BENCH_DETAIL_r{int(round_tag):02d}.json"
        if round_tag.isdigit()
        else "BENCH_DETAIL.json"
    )
    # reassign sidecar_name: the error pointer below must name the file
    # actually written (the collision-suffixed sibling), not the stamped
    # base name a previous run already owns
    sidecar_name = _free_sidecar_name(repo_dir, sidecar_name)
    sidecar = os.path.join(repo_dir, sidecar_name)
    sidecar_ok = True
    try:
        with open(sidecar, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        sidecar_ok = False
    # Lean stdout line: 2-dp medians, compact separators, no spread/errors.
    out = {
        "metric": "headline_queries_total_seconds",
        "value": total,
        "value_r1_subset": r1_subtotal,
        "value_r1_subset_normalized": r1_normalized,
        "calibration_s": calibration_s,
        "calibration_shuffle_s": calibration_shuffle_s,
        "calibration_scan_s": calibration_scan_s,
        "calibration_scan_ratio": cal_scan_ratio,
        "r1_n": len(r1_present),
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "reps": reps,
        "sf": sf_val,
    }
    if errors:
        # point at the sidecar only if it actually landed on disk;
        # otherwise inline a truncated real message so the round's error
        # detail is not lost entirely
        out["errors"] = {
            n: (f"see {sidecar_name}" if sidecar_ok else msg[:80])
            for n, msg in errors.items()
        }
    line = json.dumps(out, separators=(",", ":"))
    # Printed twice: the driver's tail capture then always holds at least
    # one complete copy even if another writer interleaves mid-line.
    sys.stdout.flush()
    print(line)
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
