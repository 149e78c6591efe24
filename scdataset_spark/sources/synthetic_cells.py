"""S6 — custom source hook as a Spark 4 Python DataSource.

The reference's ``fetch_callback`` lets users plug an arbitrary store
(doc example: a SQL database — ``docs/source/transforms.rst:66-100``).
Spark's first-class equivalent is a DataSource V2 implementation; since
PySpark 4 that is writable in pure Python.  This module provides a
deterministic synthetic single-cell source: partition-parallel, seeded
by the portable ``mix`` so a SQL oracle can re-derive every row —
i.e. even the *custom source* is correctness-checked, not just smoke-run.

PICKLING CONSTRAINT: Spark serializes the DataSource class to its
Python *workers*.  A module-level class is pickled by reference, which
breaks whenever the worker cannot import this package (driver launched
from another cwd, package not shipped).  ``build_datasource()`` defines
everything at function-local scope so cloudpickle serializes the class
(and its helpers) BY VALUE — fully self-contained, no import needed on
the worker.

Register and read::

    spark.dataSource.register(build_datasource())
    df = (spark.read.format("synthetic_cells")
          .option("n_rows", 10000).option("seed", 7).load())
"""

from __future__ import annotations


def build_datasource():
    """Return a self-contained SyntheticCellsDataSource class (see
    module docstring for why this is a factory)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    MIX_MOD = 2_147_483_647

    def _mix(k: int, seed: int) -> int:
        h1 = (
            (k % MIX_MOD) * 2_654_435_761
            + (seed % MIX_MOD) * 2_246_822_519 % MIX_MOD
            + 3_266_489_917
        ) % MIX_MOD
        x = h1 ^ (h1 >> 21)
        h2 = (x * 1_597_334_677) % MIX_MOD
        y = h2 ^ (h2 >> 16)
        return (y * 1_103_515_245 + 12_345) % MIX_MOD

    class _Part(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class SyntheticCellsReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 1000))
            self.seed = int(options.get("seed", 42))
            self.n_parts = int(options.get("partitions", 8))

        def partitions(self):
            step = (self.n_rows + self.n_parts - 1) // self.n_parts
            return [
                _Part(i * step, min((i + 1) * step, self.n_rows))
                for i in range(self.n_parts)
                if i * step < self.n_rows
            ]

        def read(self, partition):
            for cell_id in range(partition.start, partition.end):
                plate = _mix(cell_id, self.seed) % 14 + 1
                depth = 1000 + _mix(cell_id, self.seed + 1) % 9000
                yield (cell_id, plate, float(depth))

    class SyntheticCellsDataSource(DataSource):
        """schema: cell_id bigint, plate int, depth double."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_cells"

        def schema(self) -> str:
            return "cell_id bigint, plate int, depth double"

        def reader(self, schema) -> SyntheticCellsReader:
            return SyntheticCellsReader(self.options)

    return SyntheticCellsDataSource


# convenience import target for tests; NOTE: register build_datasource()
# (the factory result), never a module-level class — see module docstring
SyntheticCellsDataSource = build_datasource()
