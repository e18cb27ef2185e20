from .loader import DRIVER_TABLES, load_table, register_views
from .schemas import MUSIC_SCHEMAS
from .fixtures import load_reference_fixture

__all__ = [
    "DRIVER_TABLES",
    "MUSIC_SCHEMAS",
    "load_table",
    "register_views",
    "load_reference_fixture",
]
