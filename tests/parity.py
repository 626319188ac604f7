"""Replica of the driver's oracle comparison so mismatches surface in
pytest before the driver's CORRECTNESS gate runs.

Comparison contract (per __spark_entry__.py docstring): row count +
schema (column names) + order-insensitive value hash. We normalize
values conservatively — Decimal kept exact, timestamps to naive UTC,
floats kept exact (bit-identical is the goal; queries are written so
both engines produce identical bits).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
from collections import Counter


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm(x) for x in v))
    return v


def spark_rows(df):
    cols = sorted(df.columns)
    return cols, [tuple(_norm(r[c]) for c in cols) for r in df.collect()]


def duck_rows(con, sql):
    # Fetch through Arrow, not fetchall(): fetchall() collapses DuckDB HUGEINT
    # (the result type of a bare integer sum()) to Python int, hiding exactly
    # the int64-vs-decimal128 type mismatch the driver's typed value-hash
    # catches.  Arrow preserves decimal128, so _norm tags it ("dec", ...) and
    # the mismatch surfaces locally before the CORRECTNESS gate runs.
    tbl = con.execute(sql).arrow()
    names = list(tbl.column_names)
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    pycols = [tbl.column(i).to_pylist() for i in order]
    return cols, [tuple(_norm(v) for v in row) for row in zip(*pycols)]


def compare(df, con, sql) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    scols, srows = spark_rows(df)
    dcols, drows = duck_rows(con, sql)
    problems = []
    if scols != dcols:
        problems.append(f"columns differ: spark={scols} duckdb={dcols}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duckdb={len(drows)}")
    sc, dc = Counter(srows), Counter(drows)
    only_s = list((sc - dc).items())[:5]
    only_d = list((dc - sc).items())[:5]
    if only_s or only_d:
        problems.append(f"value mismatch; spark-only={only_s} duckdb-only={only_d}")
    return problems
