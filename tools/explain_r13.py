"""Capture .explain('formatted') for headline queries into plans/r13/.

Usage:
    python tools/explain_r13.py before [query ...]
    python tools/explain_r13.py after  [query ...]

Writes plans/r13/<query>_<tag>.txt for each query (default: the bench
headline set).  Also prints a one-line plan-shape summary per query:
Exchange count, join strategies, Python-eval nodes — the metrics the
optimization guide says to watch (§7.2).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENSION_HEADLINE, HEADLINE  # noqa: E402
from dbt_glue_spark.plans.catalog import SPECS  # noqa: E402
from dbt_glue_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )
    py = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
        r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas)\b",
        plan,
    )
    from collections import Counter

    j = ",".join(f"{k}x{v}" for k, v in sorted(Counter(joins).items()))
    p = ",".join(f"{k}x{v}" for k, v in sorted(Counter(py).items()))
    return f"Exchange={n_ex} joins=[{j}] py=[{p}]"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_r13")
    spark.sparkContext.setLogLevel("ERROR")
    specs = SPECS()
    if not names:
        names = [n for n in HEADLINE + EXTENSION_HEADLINE if n in specs]
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            plan = plan_text(df)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {summarize(plan)}", flush=True)


if __name__ == "__main__":
    main()
