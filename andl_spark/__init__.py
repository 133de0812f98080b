"""andl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of david-pfx/Andl (Tutorial-D-style
relational algebra), re-designed Spark-first for 100 TB scale, plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Public surface:
    from andl_spark import Relation, get_spark, load_tables
    from andl_spark import AndlSession        # catalog + operators + sql()
    from andl_spark import AndlRestServer     # REST/JSON serving
    from andl_spark.lang import run_file      # run .andl scripts
    python -m andl_spark script.andl          # CLI (Andl.Main parity)
"""

from .api import AndlSession
from .operators.asof import asof_join
from .relation import Relation
from .server import AndlRestServer
from .session import BROADCAST_DIMS, TABLES, get_spark, load_tables

__all__ = [
    "AndlRestServer", "AndlSession", "Relation", "asof_join",
    "get_spark", "load_tables", "TABLES", "BROADCAST_DIMS",
]
__version__ = "0.1.0"
