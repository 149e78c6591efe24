"""Driver-checkable query registry.

Every implemented operator from SURVEY.md §2 registers one named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL can
express the same semantics) a DuckDB oracle SQL string.  The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides
- double-valued outputs that could drift by summation order are rounded
  on BOTH sides (integers and deterministic single-op doubles are exact)
- all randomness goes through the engine-portable ``mix()`` so even
  shuffle/sample ORDER is oracle-checked
"""

from scdataset_spark.queries.registry import REGISTRY, QuerySpec, query  # noqa: F401

# importing the modules populates the registry
from scdataset_spark.queries import sampling  # noqa: F401,E402
from scdataset_spark.queries import relational  # noqa: F401,E402
from scdataset_spark.queries import llm  # noqa: F401,E402
from scdataset_spark.queries import streaming_batch  # noqa: F401,E402
from scdataset_spark.queries import metrics  # noqa: F401,E402
from scdataset_spark.queries import extended  # noqa: F401,E402


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def headline_queries():
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.headline}
