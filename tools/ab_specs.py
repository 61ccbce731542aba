"""Interleaved same-session A/B of catalog SPECS under two versions of one
extension module (old loaded verbatim from a file, new from the live tree).

Variants alternate rep-by-rep inside ONE session so box drift hits both
arms equally (the r12/r13 decision-grade discipline).  The old arm is
installed by monkeypatching the named public functions onto the live
module object between reps — spec bodies resolve ``dedup.fn`` at call
time, so the swap is complete and reversible.

Usage:
    python tools/ab_specs.py <old_module_path> <live_module_name> \
        <fn1,fn2,...> <reps_per_arm> <spec1,spec2,...>
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_glue_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    old_path, live_name, fn_csv, reps, spec_csv = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
        sys.argv[5],
    )
    fn_names = fn_csv.split(",")
    spec_names = spec_csv.split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("ab_specs")
    spark.sparkContext.setLogLevel("ERROR")

    live_mod = importlib.import_module(live_name)
    new_fns = {n: getattr(live_mod, n) for n in fn_names}

    spec = importlib.util.spec_from_file_location("ab_old_mod", old_path)
    old_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_mod)
    old_fns = {n: getattr(old_mod, n) for n in fn_names}

    from dbt_glue_spark.plans.catalog import SPECS

    specs = SPECS()

    def release():
        from dbt_glue_spark.streaming.pipelines import release_static_caches

        release_static_caches()
        spark.catalog.clearCache()

    for sname in spec_names:
        samples: dict[str, list[float]] = {"old": [], "new": []}
        # one unmeasured warm rep per arm
        order = ["old", "new"] + ["old", "new"] * reps
        for i, arm in enumerate(order):
            fns = old_fns if arm == "old" else new_fns
            for n, f in fns.items():
                setattr(live_mod, n, f)
            release()
            spark.sparkContext.setJobDescription(f"ab:{sname}:{arm}:{i}")
            t0 = time.monotonic()
            force(specs[sname].fn(spark, sf_dir))
            dt = time.monotonic() - t0
            if i >= 2:
                samples[arm].append(dt)
        for n, f in new_fns.items():
            setattr(live_mod, n, f)
        mo = statistics.median(samples["old"])
        mn = statistics.median(samples["new"])
        print(
            f"{sname}: old={mo:.3f} new={mn:.3f} ratio={mn / mo:.3f} "
            f"old_samples={[round(x, 3) for x in samples['old']]} "
            f"new_samples={[round(x, 3) for x in samples['new']]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
