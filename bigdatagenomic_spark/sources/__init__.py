from bigdatagenomic_spark.sources.graphlab_text import read_graphlab_text, reads_to_edges
from bigdatagenomic_spark.sources.tables import TABLES, load_tables, register_views

__all__ = [
    "read_graphlab_text",
    "reads_to_edges",
    "load_tables",
    "register_views",
    "TABLES",
]
