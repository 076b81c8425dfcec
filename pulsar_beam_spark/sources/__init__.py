from .tables import TABLES, load_table, register_views  # noqa: F401
from .layout import (  # noqa: F401
    compact_small_files,
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
