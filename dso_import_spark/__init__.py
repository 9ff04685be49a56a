"""dso_import_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the semantics of Amsterdam/dso-import
(a batch ETL pipeline importing the historical Dutch BAG registry with
SCD2 temporal merge, referential-integrity validation and data-quality
gates) as an idiomatic Spark DataFrame/SQL engine, extended with the
operators a large-scale LLM training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis, multimodal column plumbing, and
streaming window aggregation.

Design rules (see SURVEY.md §4/§7):
- DataFrame / Spark SQL only; every reference row-loop becomes Column
  expressions so Catalyst sees through them.
- UDFs only where built-ins genuinely can't express the semantics
  (geometry parsing, embedding batch ops) — and then Arrow-batched
  Pandas UDFs, never per-row Python.
- Broadcast small build sides; anti/semi joins for FK validation;
  AQE on for skew; no driver-side collects in any operator.
"""

__version__ = "0.1.0"
