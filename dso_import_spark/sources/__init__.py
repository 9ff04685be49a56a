from dso_import_spark.sources.registry import FIXTURE_TABLES, load_table, load_tables

__all__ = ["FIXTURE_TABLES", "load_table", "load_tables"]
