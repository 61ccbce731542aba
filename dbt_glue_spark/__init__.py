"""dbt_glue_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the
``aws-samples/dbt-glue`` dbt adapter (reference at /root/reference) as an
in-process, Spark-first engine: models are declared as SQL strings or Python
functions, materialized via idiomatic DataFrame / Spark SQL plans (CTAS,
dynamic partition overwrite, composed MERGE, SCD2 snapshots), with the
catalog backed by the Spark session catalog instead of AWS Glue + boto3.

Layout
------
- ``session``            SparkSession factory with scale-ready defaults
- ``sources``            parquet/csv/json readers, testdata registry, seeds
- ``catalog``            relation existence/columns/rename/drop over spark.catalog
- ``materializations``   view / table / incremental (append, insert_overwrite,
                         merge) / snapshot (SCD2) / seed / python model
- ``operators``          engine operators Spark lacks natively on plain
                         parquet: composed MERGE upsert, schema evolution
- ``functions``          scalar helpers (SCD hash, vector math, text stats)
- ``quality``            data-quality test operators (unique, not_null,
                         accepted_values, relationships)
- ``extensions``         LLM-data-pipeline operators: dedup (exact, MinHash-LSH,
                         SimHash, n-gram Jaccard), similarity search, text
                         analysis, multimodal column plumbing
- ``streaming``          Structured Streaming wrappers for event pipelines
- ``plans``              model/project declaration + DAG runner
"""

__version__ = "0.1.0"
