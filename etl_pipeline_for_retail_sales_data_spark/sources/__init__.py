from .readers import load_events, load_table, load_tables, read_sales_csv, sales_from_lineitem  # noqa: F401
