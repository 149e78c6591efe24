"""Mirror of the driver's DuckDB-oracle correctness gate.

For every registered query with an oracle, run the Spark DataFrame and
the DuckDB SQL on the same sf0.01 parquet and compare row count, column
names, and (order-insensitively) every value.  This is intentionally
stricter than a hash: on mismatch it prints the first differing rows.
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from scdataset_spark.queries import REGISTRY
from tests.conftest import SF_DIR

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — we engineered bit-equality
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    # duckdb may return Decimal/np types
    try:
        import numpy as np

        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (np.floating,)):
            return repr(float(v))
    except ImportError:
        pass
    from decimal import Decimal

    if isinstance(v, Decimal):
        return repr(float(v))
    return str(v)


def _canonical(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(spec.oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"

    s_canon = _canonical(s_rows, s_cols)
    d_canon = _canonical(d_rows, d_cols)
    if s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs spark-vs-duck: {diffs}")
