"""Star-policy scale probe: capped MinHash-LSH on GROWING duplicate
families.

The dupheavy axis proved the semantics (star keeps duplicate families
connected where drop erased them); this probe measures the COST curve
the star policy was designed for: duplicate families whose size grows
with the corpus — the regime where the uncapped bucket self-join is
quadratic and the old drop policy was linear only by answering nothing.

Two replication regimes over a dupheavy-mutated sf0.1 corpus
(5k docs, five ~850-doc mirror families):

- ``weak``  — per-replica disjoint vocabularies (build_scaled): family
  SIZE stays ~1k, family COUNT grows ∝ factor. Many over-cap buckets.
- ``growth`` — id-offset replicas sharing one vocabulary: family size
  grows ∝ factor (×16 → ~16k-member families). One mega family per
  canonical; the star emits O(family) candidates where the uncapped
  join would emit O(family²) ≈ 1.3e8 pairs at ×16.

Measured pipeline per point: capped-LSH pair generation (star default)
AND the full production composition pairs → dup_clusters (star
components are diameter-2, so propagation converges in ~2 rounds).

Usage: python tools/dupscale_probe.py [--factors=4,16] [--regime=both]
Prints one JSON line; run on an idle box (scaling evidence discipline).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dbt_glue_spark.extensions import dedup
from dbt_glue_spark.session import get_spark
from dbt_glue_spark.sources.registry import load_table
from gen_pathological import mutate_dupheavy  # noqa: E402


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def _growth_scaled(spark, base_path: str, factor: int, out_dir: str) -> str:
    docs = spark.read.parquet(base_path).select("doc_id", "text")
    reps = [docs]
    for r in range(1, factor):
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                "text",  # SAME vocabulary: families merge across replicas
            )
        )
    scaled = reps[0]
    for p in reps[1:]:
        scaled = scaled.unionByName(p)
    path = os.path.join(out_dir, f"growth_x{factor}")
    scaled.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    factors = [4, 16]
    regime = "both"
    for a in sys.argv[1:]:
        if a.startswith("--factors"):
            factors = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--regime"):
            regime = a.split("=", 1)[1]
    spark = get_spark("dupscale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="dgs_dupscale_")
    out: dict = {"factors": factors, "seconds": {}, "rows": {}, "pairs": {}}
    try:
        base = os.path.join(scratch, "dupheavy_sf001")
        mutate_dupheavy(
            load_table(spark, "/root/testdata/sf0.1", "documents"), rows=None
        ).select("doc_id", "text").repartition(8).write.mode(
            "overwrite"
        ).parquet(base)

        def run_point(tag: str, path: str) -> None:
            docs = spark.read.parquet(path)
            out["rows"][tag] = docs.count()
            pairs_holder = {}

            def run_lsh():
                p = dedup.minhash_lsh_pairs(docs, threshold=0.5)
                pairs_holder["n"] = p.count()

            t_lsh = _timed(run_lsh)
            dedup.release_caches()

            def run_pipeline():
                p = dedup.minhash_lsh_pairs(docs, threshold=0.5)
                dedup.dup_clusters(docs, p).write.format("noop").mode(
                    "overwrite"
                ).save()

            t_pipe = _timed(run_pipeline)
            dedup.release_caches()
            out["seconds"][tag] = {"lsh_capped": t_lsh, "lsh_plus_clusters": t_pipe}
            out["pairs"][tag] = pairs_holder.get("n")
            print(tag, out["seconds"][tag], "pairs:", out["pairs"][tag],
                  file=sys.stderr)

        run_point("base", base)
        for f_ in factors:
            if regime in ("both", "weak"):
                run_point(f"weak_x{f_}", _weak(spark, base, f_, scratch))
            if regime in ("both", "growth"):
                run_point(f"growth_x{f_}", _growth_scaled(spark, base, f_, scratch))
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _weak(spark, base_path: str, factor: int, out_dir: str) -> str:
    """Disjoint-vocabulary replication of a raw parquet docs table (the
    build_scaled suffix scheme, applied to a path instead of an sf dir)."""
    docs = spark.read.parquet(base_path).select("doc_id", "text")
    reps = [docs]
    for r in range(1, factor):
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit("\x1f" + str(r))),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    scaled = reps[0]
    for p in reps[1:]:
        scaled = scaled.unionByName(p)
    path = os.path.join(out_dir, f"weak_x{factor}")
    scaled.repartition(32).write.mode("overwrite").parquet(path)
    return path


if __name__ == "__main__":
    main()
