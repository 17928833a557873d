"""neural_search_spark — a PySpark-native engine with the query and
data-processing capabilities of opensearch-project/neural-search.

Built Spark-first: every operator is declared with the DataFrame API so
Catalyst/Tungsten pick the physical plan (predicate pushdown, column
pruning, whole-stage codegen, AQE). Python UDFs appear only where the
semantics genuinely cannot be expressed with built-in functions (model
inference stubs, per-posting-list clustering), and then always as
Arrow-batched pandas UDFs / applyInPandas.

Reference parity citations in docstrings are `path:line` relative to the
reference checkout of opensearch-project/neural-search.
"""

__version__ = "0.1.0"
