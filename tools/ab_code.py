"""Interleaved same-session A/B of two Python implementations of one
operator (old body loaded verbatim from a git ref via a temp module file,
new body from the live tree).  Same discipline as ab_conf.py: variants
alternate rep-by-rep inside ONE session so box drift hits both arms.

Usage:
    python tools/ab_code.py <old_module_path> <fn_name> <reps_per_arm> <builder_py>

``builder_py`` is a Python expression evaluated with (spark, sf_dir, fn)
in scope that must return the operator's output DataFrame, e.g.:

    python tools/ab_code.py /tmp/similarity_old.py mmr_rerank 5 \
      "fn(load('embeddings'), load('embeddings').filter('vec_id < 4'), n_candidates=20, k=8)"
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_glue_spark.session import get_spark  # noqa: E402
from dbt_glue_spark.sources.registry import load_table  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    old_path, fn_name, reps, expr = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        sys.argv[4],
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_code")
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location("ab_old_mod", old_path)
    old_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_mod)
    old_fn = getattr(old_mod, fn_name)

    import importlib as _il

    new_mod_name = None
    for mod_name in list(sys.modules):
        if mod_name.startswith("dbt_glue_spark") and hasattr(
            sys.modules[mod_name], fn_name
        ):
            new_mod_name = mod_name
    if new_mod_name is None:
        # import the extensions package and search again
        import dbt_glue_spark.extensions.similarity  # noqa: F401
        import dbt_glue_spark.extensions.dedup  # noqa: F401
        import dbt_glue_spark.extensions.retrieval  # noqa: F401
        for mod_name in list(sys.modules):
            if mod_name.startswith("dbt_glue_spark") and hasattr(
                sys.modules[mod_name], fn_name
            ):
                new_mod_name = mod_name
    new_fn = getattr(sys.modules[new_mod_name], fn_name)

    def load(t):
        return load_table(spark, sf_dir, t)

    def build(fn):
        return eval(expr, {"fn": fn, "load": load, "spark": spark, "sf_dir": sf_dir})

    from dbt_glue_spark.extensions.dedup import release_caches

    # warm both once (codegen/footers)
    force(build(old_fn))
    release_caches()
    force(build(new_fn))
    release_caches()
    arms: dict[str, list[float]] = {"old": [], "new": []}
    for r in range(2 * reps):
        which = "old" if r % 2 == 0 else "new"
        fn = old_fn if which == "old" else new_fn
        t0 = time.time()
        force(build(fn))
        arms[which].append(time.time() - t0)
        release_caches()
    mo, mn = statistics.median(arms["old"]), statistics.median(arms["new"])
    so = ",".join(f"{x:.2f}" for x in arms["old"])
    sn = ",".join(f"{x:.2f}" for x in arms["new"])
    print(
        f"{fn_name}: old_med={mo:.3f} new_med={mn:.3f} new/old={mn / mo:.2f} "
        f"old[{so}] new[{sn}]"
    )


if __name__ == "__main__":
    main()
