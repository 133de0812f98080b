"""andl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of david-pfx/Andl (Tutorial-D-style
relational algebra), re-designed Spark-first for 100 TB scale, plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Public surface:
    from andl_spark import Relation, get_spark, load_tables
"""

from .relation import Relation
from .session import BROADCAST_DIMS, TABLES, get_spark, load_tables

__all__ = ["Relation", "get_spark", "load_tables", "TABLES", "BROADCAST_DIMS"]
__version__ = "0.1.0"
