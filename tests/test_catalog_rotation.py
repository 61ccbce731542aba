"""Unit tests pinning the catalog's driver-rotation semantics.

The rotation (catalog._previously_checked) decides which queries the
external correctness gate re-samples: it is load-bearing for driver
coverage but was, until round 8, only exercised in production. These
tests pin the r2 lesson (a query whose LATEST row is red must re-enter
the sampled prefix, even if an older row was green) against synthetic
CORRECTNESS_r*.json sequences.
"""

from __future__ import annotations

import json
import os

from dbt_glue_spark.plans.catalog import _previously_checked


def _write(root, rnd: int, rows: dict) -> None:
    with open(os.path.join(root, f"CORRECTNESS_r{rnd}.json"), "w") as fh:
        json.dump(rows, fh)


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
RED = {"rows_match": True, "schema_match": True, "hash_match": False}
ERR = {"err": "AnalysisException: boom"}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None}


def test_latest_row_wins_red_then_green(tmp_path):
    root = str(tmp_path)
    _write(root, 1, {"q_a": GREEN, "q_b": GREEN, "q_c": GREEN})
    # r2: q_a errs, q_b mismatches — BOTH must become resample-eligible
    # despite their green r1 rows (the r2 incident: any-historical-row
    # counting buried two regressions for two rounds)
    _write(root, 2, {"q_a": ERR, "q_b": RED, "q_c": GREEN})
    assert _previously_checked(root) == {"q_c"}
    # r3: the fixes land and earn fresh green rows — checked again
    _write(root, 3, {"q_a": GREEN, "q_b": GREEN})
    assert _previously_checked(root) == {"q_a", "q_b", "q_c"}


def test_rows_only_checks_count_as_checked(tmp_path):
    """Oracle-less queries record null matches and no err: re-sampling
    them never produces a stronger signal, so they count as checked."""
    root = str(tmp_path)
    _write(root, 1, {"q_stream": ROWS_ONLY, "q_sql": GREEN})
    assert _previously_checked(root) == {"q_stream", "q_sql"}


def test_numeric_round_order_not_lexicographic(tmp_path):
    """r10+ files must not sort between r1 and r2: the newest row is the
    one with the highest round NUMBER."""
    root = str(tmp_path)
    _write(root, 2, {"q_a": GREEN})
    _write(root, 10, {"q_a": RED})  # lexicographically before r2
    assert _previously_checked(root) == set()
    _write(root, 11, {"q_a": GREEN})
    assert _previously_checked(root) == {"q_a"}


def test_unreadable_file_skipped(tmp_path):
    root = str(tmp_path)
    _write(root, 1, {"q_a": GREEN})
    with open(os.path.join(root, "CORRECTNESS_r2.json"), "w") as fh:
        fh.write("{not json")
    assert _previously_checked(root) == {"q_a"}


def test_never_checked_tier_sorts_first(tmp_path, monkeypatch):
    """End-to-end over the real catalog: with a synthetic history marking
    every query green EXCEPT one red and one absent, the sampled prefix
    leads with exactly those two."""
    import dbt_glue_spark.plans.catalog as cat

    cat._load_all()
    names = list(cat._REGISTRY)
    red, fresh = names[5], names[17]
    rows = {
        n: (RED if n == red else GREEN) for n in names if n != fresh
    }
    root = str(tmp_path)
    _write(root, 1, rows)
    monkeypatch.setattr(
        cat, "_previously_checked", lambda: _previously_checked(root)
    )
    ordered = list(cat._interleaved())
    assert set(ordered[:2]) == {red, fresh}
    assert len(ordered) == len(names)
