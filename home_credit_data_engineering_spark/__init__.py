"""home_credit_data_engineering_spark — a PySpark-native analytics engine.

A brand-new, Spark-first rebuild of the query and data-processing
capabilities of the reference repo ``AdrienDuval/home-credit-data-engineering``
(a medallion Bronze→Silver→Gold lakehouse over the Home Credit Default Risk
dataset), extended with large-scale training-data-pipeline operators
(deduplication, similarity search, text analysis, multimodal columns,
structured streaming).

Design principles (see SURVEY.md §7):

- **DataFrame/SQL first.** Every operator is declared through the DataFrame
  API so Catalyst handles predicate pushdown, column pruning, join strategy
  selection, and whole-stage codegen. No RDDs in the hot path.
- **Declared schemas.** The reference infers schemas everywhere
  (reference ``spark/bronze/feeder_csv.py:95-100``); this engine declares
  ``StructType`` schemas in :mod:`.schema` and uses tolerant readers.
- **Snapshot-filtered reads.** The reference's base-path reads multiply
  rows across ingest dates (SURVEY §3.4); this engine always partition-
  filters snapshot reads (:mod:`.sources.readers`).
- **Scale posture.** AQE on, broadcast hints for dimension joins,
  explicit shuffle-partition sizing, salting helpers for skew — designed
  for a 1000-executor / 100 TB deployment even though tests run local.
"""

from home_credit_data_engineering_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
