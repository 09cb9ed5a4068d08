"""mapreduce_server_development_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference MapReduce framework (ChristineWmy/MapReduce-Server-Development,
surveyed in SURVEY.md), re-expressed Spark-first:

- the MapReduce dataflow (partition -> map -> sort -> group-by-key ->
  reduce -> sink) becomes ``operators.mapreduce`` (``rdd.pipe`` for the
  arbitrary-executable contract, Spark shuffle for the group stage);
- the reference's query library (word count, grep) plus a full
  relational operator surface lives in ``plans.queries``;
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) live in ``functions/``;
- Structured Streaming over the events table lives in ``streaming/``.

Everything is DataFrame-first so Catalyst/Tungsten own the physical plan.
"""

from .session import get_spark
from .sources.tables import TABLES, load_table, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]
__version__ = "0.1.0"
