from .citations import load_citations, load_nodepairs, load_published_dates
from .sinks import save_csv_single, save_sorted_csv_single
from .tables import load_table, load_tables

__all__ = [
    "load_citations",
    "load_published_dates",
    "load_nodepairs",
    "load_table",
    "load_tables",
    "save_csv_single",
    "save_sorted_csv_single",
]
