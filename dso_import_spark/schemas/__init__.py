from dso_import_spark.schemas.bagh import BAGH_SCHEMAS, TABLE_ORDER, TableConfig, TABLE_CONFIGS

__all__ = ["BAGH_SCHEMAS", "TABLE_ORDER", "TableConfig", "TABLE_CONFIGS"]
