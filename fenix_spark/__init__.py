"""fenix_spark — a PySpark-native analytics engine with the query surface
of nrlugg/fenix (vector KNN search, IVF/PQ indexing) plus the relational
and LLM-data-pipeline operators a 100 TB training-data pipeline needs.

Design principles (see SURVEY.md §7):

- DataFrame/Spark-SQL first: every operator is a lazy logical plan that
  Catalyst optimizes (predicate pushdown, column pruning, partition
  pruning, AQE). No RDDs, no driver-side row loops.
- Native column expressions over Python UDFs in every hot path; Arrow
  pandas UDFs only where built-ins genuinely can't express the semantics.
- Deterministic outputs: every top-k carries an explicit id tiebreak so
  results are oracle-checkable (reference's ``select_k_unstable`` is
  tie-unstable; we are stricter).
- No reliance on row order: indexes are co-written columns keyed by
  explicit ids, never positional h-stacks (the reference's row-aligned
  sidecar files do not survive a distributed shuffle).
"""

from fenix_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
