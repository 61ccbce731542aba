"""Skew-degradation probe: clean sf0.1 vs a FULL-SIZE hot-key mutation.

The parity axes (gen_pathological --variant=hot) prove CORRECTNESS under
90 % key skew on 300-row samples; this probe measures RUNTIME
degradation at full sf0.1 when 90 % of every FK/group key collapses to
one value — the shape where a naive single-partition window or unsalted
shuffle degrades superlinearly. Probed: the window / as-of / groupBy
family keyed on the skewed columns, plus an unkeyed control.

A ratio near 1 means the operator's cost is insensitive to key
distribution (map-side partials, AQE skew handling, bounded windows); a
large ratio flags a single-partition hot spot that would become a
straggler at 100 TB. Results and adjudications live in SCALE.md
("Round-6 skew-degradation probe").

Usage: python tools/skew_probe.py [sf_dir] [--reps=3]
Prints one JSON line: {query: {"clean": s, "hot": s, "ratio": r}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from gen_pathological import mutate_hot  # noqa: E402

from dbt_glue_spark.plans.catalog import SPECS  # noqa: E402
from dbt_glue_spark.session import get_spark  # noqa: E402
from dbt_glue_spark.sources.registry import TABLES, load_table  # noqa: E402

# Window/as-of/groupBy queries keyed on the columns the hot variant skews
# (user_id, custkey, suppkey, lang, source), plus events_hourly as the
# unkeyed control — its group key (hour) is untouched by the mutation.
PROBED = [
    "sessionize_events_batch",       # window by user_id
    "window_top_orders_per_customer",  # window by o_custkey
    "asof_join_clicks_purchases",    # as-of union-window by user_id
    "last_touch_attribution",        # as-of by user_id + type rollup
    "rfm_segments",                  # groupBy user_id
    "ext_top_tokens_per_lang",       # window per lang (90% en)
    "ext_quality_top_per_source",    # window per source (90% src7)
    "q5_local_supplier_volume",      # join chain incl. suppkey/custkey
    "events_hourly",                 # control: group key untouched
    # round-7 promoted heavyweights with skew-sensitive shapes (VERDICT
    # r6 item 6): hot l_partkey=7 turns the co-purchase graph into one
    # hub — the exact stress Suri–Vassilvitskii degree-ordering and the
    # C(basket,2) pair generation exist for; hot o_custkey=7 piles the
    # interval-island keyed windows onto one key.
    "ext_basket_lift",               # pair gen from hot-item baskets
    "ext_triangle_parts",            # power-law hub triangle counting
    "ext_interval_islands",          # keyed lag/sum windows by custkey
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(fn, reps: int) -> float:
    import statistics

    samples = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    spark = get_spark("skew_probe")
    spark.sparkContext.setLogLevel("ERROR")

    hot_dir = tempfile.mkdtemp(prefix="dgs_skew_probe_")
    try:
        for t in TABLES:
            mutate_hot(load_table(spark, sf_dir, t), rows=None).write.mode(
                "overwrite"
            ).parquet(os.path.join(hot_dir, f"{t}.parquet"))

        specs = SPECS()
        results: dict[str, dict] = {}
        # warm up EVERY probed query's codegen on both directories —
        # each plan compiles its own WholeStageCodegen, so warming only
        # one query would leave the others' first rep paying compile
        # time (visible at --reps=1 on sub-second queries)
        for name in PROBED:
            _force(specs[name].fn(spark, sf_dir))
            _force(specs[name].fn(spark, hot_dir))
        for name in PROBED:
            clean = _time(lambda: _force(specs[name].fn(spark, sf_dir)), reps)
            hot = _time(lambda: _force(specs[name].fn(spark, hot_dir)), reps)
            results[name] = {
                "clean": clean,
                "hot": hot,
                "ratio": round(hot / clean, 2) if clean else None,
            }
            print(name, results[name], file=sys.stderr)
        print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": results}))
    finally:
        shutil.rmtree(hot_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
