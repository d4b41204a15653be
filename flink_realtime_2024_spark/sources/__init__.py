from .io import load_table, register_views, sink_parquet  # noqa: F401
