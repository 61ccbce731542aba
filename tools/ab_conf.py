"""Interleaved same-session A/B of a runtime SQL conf over chosen queries.

The box's shuffle/scan probes flap 1.3-5x between (and within) runs, so
absolute cross-run timings are not decision-grade (r12 finding).  This
harness alternates conf value A and value B rep-by-rep inside ONE Spark
session, so box drift hits both arms equally; per-query output is the
median of each arm plus the A/B ratio.  Include a no-join control query
to read the session's noise floor.

Usage:
    python tools/ab_conf.py <conf_key> <valueA> <valueB> <reps_per_arm> q1 q2 ...

Example (r13 SHJ adjudication):
    python tools/ab_conf.py spark.sql.join.preferSortMergeJoin false true 5 \
        q21_waiting_suppliers ext_prefix_jaccard_join window_running_total
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_glue_spark.plans.catalog import SPECS  # noqa: E402
from dbt_glue_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    key, va, vb = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4])
    names = sys.argv[5:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_conf")
    spark.sparkContext.setLogLevel("ERROR")
    specs = SPECS()
    from dbt_glue_spark.extensions.dedup import release_caches
    from dbt_glue_spark.streaming.pipelines import release_static_caches

    # warmup: JVM + parquet footers for the table families involved
    force(specs["flagship_revenue_by_nation"].fn(spark, sf_dir))
    force(specs["ext_text_stats"].fn(spark, sf_dir))
    print(f"# A = {key}={va}   B = {key}={vb}   reps/arm = {reps}", flush=True)
    print(f"{'query':36s} {'A_med':>7s} {'B_med':>7s} {'A/B':>6s}  samples", flush=True)
    for name in names:
        arm: dict[str, list[float]] = {va: [], vb: []}
        fn = specs[name].fn
        # one unmeasured warm rep under A so codegen/footers are paid
        spark.conf.set(key, va)
        force(fn(spark, sf_dir))
        release_caches()
        release_static_caches()
        for r in range(2 * reps):
            v = va if r % 2 == 0 else vb
            spark.conf.set(key, v)
            t0 = time.time()
            force(fn(spark, sf_dir))
            arm[v].append(time.time() - t0)
            release_caches()
            release_static_caches()
        ma = statistics.median(arm[va])
        mb = statistics.median(arm[vb])
        sa = ",".join(f"{x:.2f}" for x in arm[va])
        sb = ",".join(f"{x:.2f}" for x in arm[vb])
        print(
            f"{name:36s} {ma:7.3f} {mb:7.3f} {ma / mb:6.2f}  A[{sa}] B[{sb}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
