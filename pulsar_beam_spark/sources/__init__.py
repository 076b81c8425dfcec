from .tables import TABLES, load_table, register_views  # noqa: F401
from .layout import read_partitioned, write_bucketed, write_partitioned  # noqa: F401
