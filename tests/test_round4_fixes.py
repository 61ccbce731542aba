"""Round-4 regression locks for the r3 advisor findings.

- symlink manifest root anchored at the CATALOG table location (a
  single-partition generation must not collapse the root into the
  partition dir — Athena layout is <loc>/_symlink_format_manifest/<part>/);
- athena_manifest on an empty committed generation must not fail the run
  post-commit (empty manifest instead);
- compact after-stats must not count manifest/metadata files as data;
- resize_images decides via an explicit did-resize flag, not encoded
  byte-length coincidence;
- centroid_outliers flags undefined cosine (all-zero vector) as outlier.
"""

from __future__ import annotations

import os
import tempfile
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dbt_glue_spark.engine import Engine, Model, ModelConfig


@pytest.fixture()
def engine(spark):
    wh = tempfile.mkdtemp(prefix="dgs_r4_wh_")
    return Engine(spark, wh, schema="r4_test")


def test_symlink_manifest_single_partition_rooted_at_table_location(spark, engine):
    # one distinct partition value: commonpath of data dirs would collapse
    # to <loc>/part=only — the manifest must still live under the TABLE
    # root with the partition as its subdir (reference impl.py:766-793,
    # deltaTable.generate writes under the Delta table root)
    m = Model(
        "one_part",
        sql="select id, 'only' as part from range(5)",
        config=ModelConfig(partition_by=["part"]),
    )
    engine.add(m)
    engine.run_model(m)
    parts = engine.generate_symlink_manifest("one_part")
    assert set(parts) == {"part=only"}
    loc = engine.catalog.location(engine.relation_for("one_part"))
    root = urlparse(loc).path or loc
    mf = os.path.join(root, "_symlink_format_manifest", "part=only", "manifest")
    assert os.path.exists(mf)
    # and NOT nested inside the partition directory
    assert not os.path.exists(
        os.path.join(root, "part=only", "_symlink_format_manifest")
    )
    files = engine.ref_df("one_part").inputFiles()
    assert sorted(open(mf).read().split()) == sorted(files)


def test_athena_manifest_empty_generation_does_not_fail_run(spark, engine):
    # a zero-row (possibly zero-file) committed generation: the write
    # already succeeded — manifest generation must not raise post-commit
    m = Model(
        "empty_t",
        sql="select id from range(10) where id < 0",
        config=ModelConfig(athena_manifest=True),
    )
    engine.add(m)
    engine.run_model(m)  # must not raise
    loc = engine.catalog.location(engine.relation_for("empty_t"))
    root = urlparse(loc).path or loc
    mroot = os.path.join(root, "_symlink_format_manifest")
    assert os.path.isdir(mroot)
    files = engine.ref_df("empty_t").inputFiles()
    if not files:  # truly zero-file: an (empty) root manifest exists
        mf = os.path.join(mroot, "manifest")
        assert os.path.exists(mf) and open(mf).read() == ""
    # explicit user call keeps strict semantics
    if not files:
        with pytest.raises(ValueError):
            engine.generate_symlink_manifest("empty_t")


def test_compact_after_stats_exclude_manifest_files(spark, engine):
    m = Model(
        "compact_mf",
        sql="select id, cast(id % 2 as string) as part from range(100)",
        config=ModelConfig(partition_by=["part"], athena_manifest=True),
    )
    engine.add(m)
    engine.run_model(m)
    stats = engine.compact("compact_mf")
    # after-stats must equal the real data files of the committed
    # generation — manifest files under _symlink_format_manifest (written
    # because athena_manifest stays on through the compact rewrite) must
    # not inflate the count
    data_files = engine.ref_df("compact_mf").inputFiles()
    assert stats["files_after"] == len(data_files)


def test_resize_image_reports_explicit_flag():
    from dbt_glue_spark.extensions.multimodal import resize_image, synth_png

    big = synth_png(3, 64, 40)
    out, w, h, did = resize_image(big, max_side=32)
    assert did and max(w, h) <= 32
    small = synth_png(3, 8, 8)
    out2, w2, h2, did2 = resize_image(small, max_side=32)
    assert not did2 and out2 == small and (w2, h2) == (8, 8)


def test_centroid_outliers_flags_zero_vector(spark):
    from dbt_glue_spark.extensions.similarity import centroid_outliers

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in centroid_outliers(df).collect()}
    # zero vector: cosine undefined → must be flagged, not silently NULL
    assert out[3]["centroid_sim"] is None
    assert out[3]["outlier"] is True
    assert out[1]["outlier"] is False and out[2]["outlier"] is False


def test_fetch_default_cap_truncates_and_flags(spark, engine):
    eng = engine
    df = spark.range(50).selectExpr("id as v")
    eng.fetch_max_rows = 10
    out = eng.fetch(df)
    assert out["rowcount"] == 10 and out["truncated"] is True
    # explicit limit is the caller's own bound — not flagged as truncation
    out2 = eng.fetch(df, limit=5)
    assert out2["rowcount"] == 5 and out2["truncated"] is False
    # under the cap: complete result, not flagged
    out3 = eng.fetch(df.filter("v < 3"))
    assert out3["rowcount"] == 3 and out3["truncated"] is False
    # opt-out restores unbounded collects
    eng.fetch_max_rows = None
    assert eng.fetch(df)["rowcount"] == 50
