"""Query plans: the engine's declared query library.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLE`` maps name -> equivalent DuckDB SQL over the same parquet
tables (omitted for non-SQL-expressible operators, which get a
rows-only check per the driver contract).
"""

from .registry import ORACLE, QUERIES, query

# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import relational_tpch2  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import mapreduce_queries  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import udf_queries  # noqa: E402,F401
from . import text_ngram  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import corpus_stats  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import stats_ml  # noqa: E402,F401
from . import ml_features  # noqa: E402,F401
from . import graph_analytics  # noqa: E402,F401
from . import tokenizer  # noqa: E402,F401
from . import training_prep  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import hypothesis_tests  # noqa: E402,F401
from . import corpus_diversity  # noqa: E402,F401
from . import audience  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import data_selection  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401
from . import robust_eval  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query"]
