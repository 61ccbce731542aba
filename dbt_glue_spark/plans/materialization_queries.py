"""Materialization-semantics queries — filled in with merge/SCD2/overwrite
simulations once the materialization engine lands."""
