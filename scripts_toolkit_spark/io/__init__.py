from scripts_toolkit_spark.io.catalog import TABLES, load_table, load_tables  # noqa: F401
