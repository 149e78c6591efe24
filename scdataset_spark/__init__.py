"""scdataset_spark — a PySpark-native data-prep / minibatch-loading engine.

Re-expresses the full capability surface of the scDataset reference
(sampling strategies, block shuffling, weighted/balanced resampling,
multi-modal zip, transform hooks, batch planning, DDP partitioning,
auto-configuration) as idiomatic Spark DataFrame plans, plus the
LLM-data-pipeline extension layer (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Design stance (see SURVEY.md §7):
- schema-first DataFrames; every operator is DataFrame -> DataFrame
- all randomness is a *deterministic seeded expression* on a stable
  ``row_id`` (never ``rand()``, which is unstable under recompute)
- one ``mapInPandas`` stage for the user hook pipeline; everything else
  stays JVM-side in whole-stage codegen
- no collect()-driven control flow; plans scale by partitioning
"""

__version__ = "0.1.0"

from scdataset_spark.session import get_spark  # noqa: F401
from scdataset_spark.catalog import load_tables, load_table  # noqa: F401
