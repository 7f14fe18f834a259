from .tables import (
    TABLE_NAMES,
    load_table,
    parallelize_narrow_scan,
    register_views,
    table_row_count,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "parallelize_narrow_scan",
    "register_views",
    "table_row_count",
]
