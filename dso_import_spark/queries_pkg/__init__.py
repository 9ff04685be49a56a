"""Query modules — importing each populates dso_import_spark.queries.REGISTRY."""
