"""rdbms_scala_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query surface of the reference
``saqlainahmed913/rdbms-scala`` ("Microbase", a single-node in-memory
mini-RDBMS built on the Catalyst frontend), re-expressed Spark-first:

- the reference's hand-written analyzer/optimizer/Volcano interpreter
  (Microbase.scala:78-935) collapse into Catalyst + Tungsten;
- its catalog + eager CSV storage (Microbase.scala:29-41, 950-1032)
  become Parquet/CSV readers + temp views (:mod:`.catalog`,
  :mod:`.sources`);
- its operator set (scan/project/filter/join/agg/sort/limit/union,
  SURVEY.md §2) becomes a declarative query library
  (:mod:`.operators`, :mod:`.queries`);
- beyond reference parity: window functions, streaming
  (:mod:`.streaming`), and LLM-data-pipeline operators — dedup,
  similarity search, text analysis, multimodal plumbing
  (:mod:`.pipeline`).

Everything is designed for a multi-executor cluster at 100 TB scale
(broadcast joins for dims, partial aggregation, AQE, LSH instead of
O(n^2) joins) even though tests run on local[*].
"""

from rdbms_scala_spark.session import get_spark
from rdbms_scala_spark.catalog import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
