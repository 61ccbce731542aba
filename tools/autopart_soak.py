"""Focused soak for the SPARK_GRAFT_AUTO_PARTITIONS default decision
(r9 verdict "Next round #6"): time dup_clusters (the operator whose 64×
exponent 1.34 motivated the heuristic) at 16×/64× with the spill-aware
partition sizing ON vs OFF, same corpus, same JVM — the apples-to-apples
measurement SCALE.md's default decision cites.

Run on an idle box with SPARK_GRAFT_DRIVER_MEM=16g (the 64× point OOMs
an 8 GB driver in an AQE broadcast read — SCALE.md r8 cliff map).
Prints one JSON line: seconds per (factor, mode) + the ON/OFF ratio.

The heuristic is results-invariant (partition COUNT only); parity under
ON is separately gated by running check_parity with the env var set.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from dbt_glue_spark.extensions import dedup
from dbt_glue_spark.session import get_spark
from tools.scale_probe import build_scaled, timed


def main() -> None:
    factors = [16, 64]
    for a in sys.argv[1:]:
        if a.startswith("--factors"):
            factors = [int(x) for x in a.split("=", 1)[1].split(",")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("autopart_soak")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="dgs_autopart_soak_")
    results: dict[str, dict[str, float]] = {}
    rows: dict[str, int] = {}
    try:
        # warmup
        from dbt_glue_spark.sources.registry import load_table

        warm = load_table(spark, sf_dir, "documents").limit(500)
        dedup.dup_clusters(warm, dedup.minhash_lsh_pairs(warm)).write.format(
            "noop"
        ).mode("overwrite").save()
        dedup.release_caches()
        for f_ in factors:
            path = build_scaled(spark, sf_dir, f_, scratch)
            docs = spark.read.parquet(path)
            rows[str(f_)] = docs.count()
            # alternate OFF/ON twice each, interleaved, so box drift
            # cancels out of the ratio
            for rep in range(2):
                for mode in ("off", "on"):
                    os.environ["SPARK_GRAFT_AUTO_PARTITIONS"] = (
                        "1" if mode == "on" else ""
                    )

                    def run():
                        pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
                        dedup.dup_clusters(docs, pairs).write.format(
                            "noop"
                        ).mode("overwrite").save()

                    key = f"dup_clusters_{mode}"
                    t = timed(run)
                    prev = results.setdefault(key, {}).get(str(f_))
                    # keep the per-mode MIN of the two interleaved reps
                    results[key][str(f_)] = (
                        t if prev is None else min(prev, t)
                    )
                    dedup.release_caches()
    finally:
        os.environ.pop("SPARK_GRAFT_AUTO_PARTITIONS", None)
        shutil.rmtree(scratch, ignore_errors=True)
    ratios = {
        f: round(results["dup_clusters_on"][f] / results["dup_clusters_off"][f], 3)
        for f in results.get("dup_clusters_on", {})
        if results.get("dup_clusters_off", {}).get(f)
    }
    print(json.dumps({"rows": rows, "seconds": results, "on_over_off": ratios}))


if __name__ == "__main__":
    main()
