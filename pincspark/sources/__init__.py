from pincspark.sources.tables import load_tables, table  # noqa: F401
