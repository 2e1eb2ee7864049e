"""ontario_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SDM-TIB/Ontario (federated SPARQL over a
semantic data lake), rebuilt Spark-first.

Architecture (see SURVEY.md for the reference mapping):

- ``ontario_spark.sparql``   — SPARQL parser + AST (reference:
  ``ontario/sparql/parser/{queryParser,services}.py``).
- ``ontario_spark.catalog``  — RDF-MT / RML-style catalog: data sources,
  triple maps, predicate→molecule index (reference:
  ``ontario/config/__init__.py``, ``ontario/model/*.py``).
- ``ontario_spark.planner``  — star decomposition + source selection
  (reference: ``ontario/mediator/Decomposer.py``).
- ``ontario_spark.compiler`` — logical plan → DataFrame: star compiler,
  BGP joins, SPARQL filter→Column expression compiler (replaces every
  process-per-operator physical operator in
  ``ontario/operators/nonblocking/*`` with Catalyst-optimized DataFrame
  primitives).
- ``ontario_spark.sources``  — source registry (parquet/csv/json/jdbc),
  remote SPARQL endpoint bridge, bound-join pushdown utility.
- ``ontario_spark.operators`` — beyond-reference, training-data-pipeline
  operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding cosine), similarity search, text analysis, multimodal.
- ``ontario_spark.streaming`` — Structured Streaming operators over the
  events table.
- ``ontario_spark.queries``  — headline query definitions + DuckDB oracle
  SQL (the driver correctness surface).
"""

__version__ = "0.1.0"
