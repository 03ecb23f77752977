"""halyard_spark — a from-scratch, PySpark-native knowledge-graph
construction and query engine with the capabilities of Merck/Halyard.

The reference (Halyard v2.5, /root/reference) is an HBase/MapReduce RDF
quad store with a push-based SPARQL evaluator.  This package re-expresses
the same capabilities Spark-first:

- data model: (subj, pred, obj, ctx) rows in N-Triples lexical form
  (mirrors common/.../HalyardTableUtils.java:512-526), stored as parquet
  tables with SPO/POS/OSP sorted mirrors instead of HBase row-key
  permutations (HalyardTableUtils.java:279-287).
- bulk load (tools/.../HalyardBulkLoad.java) -> the `pipeline` package:
  extract -> link -> canonicalize -> materialize DataFrame stages.
- SPARQL algebra (strategy/.../HalyardTupleExprEvaluation.java) -> the
  `query` package: thin DataFrame combinators; Catalyst replaces the
  50-thread push scheduler.
- training-data ops (dedup / similarity / text) -> the `ops` package.
"""

__version__ = "0.1.0"

from halyard_spark.session import get_spark  # noqa: F401
