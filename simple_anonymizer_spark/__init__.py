"""simple_anonymizer_spark — a PySpark-native anonymization & subsetting engine.

A brand-new engine with the query and data-processing capabilities of
io.github.nafg/simple-anonymizer, re-expressed Spark-first: deterministic
hash anonymizers as native Catalyst expressions, a declarative per-table
spec DSL compiled to DataFrame plans, FK-aware whole-database copying with
semi-join filter propagation, plus large-scale pipeline operators (dedup,
similarity search, text analysis, streaming) the original never had.
"""

__version__ = "0.1.0"
