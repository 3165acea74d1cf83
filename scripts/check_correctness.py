"""Local replica of the driver's correctness gate — STRICT edition.

Runs every __spark_entry__.queries()[name] at sf0.01 AND the matching
oracle_sql()[name] through DuckDB on the same parquet, then compares
row count, sorted column names, and an order-insensitive value multiset.

Round-1 lesson (VERDICT.md "What's wrong" #1): the old gate normalized
floats/Decimals to 6 significant digits, so it passed queries the driver's
stricter value hash failed (DuckDB HUGEINT sums vs Spark BIGINT, decimal
rounding-mode edges). This edition goes through Arrow on BOTH sides and
keys every cell on (type-kind, exact value):

  * integer widths collapse to one kind (int32 vs int64 passed the driver
    in round 1, e.g. q20 size() vs len()) — but DECIMAL/HUGEINT do NOT
    collapse to int (that's exactly what the driver caught);
  * floats compare on full repr (exact bits), no sig-fig folding;
  * decimals compare as exact normalized strings, kind 'd' != kind 'f'.

So local green now implies bit-level value agreement plus type-kind
agreement at the Arrow layer — strictly stronger than round 1's driver
failures.

Usage: python scripts/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from __spider_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """(kind, exact-value) key. Distinct kinds never compare equal."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0:  # collapse -0.0/0.0 (same SQL value)
            return ("f", "0.0")
        return ("f", repr(v))  # full precision — exact bits
    if isinstance(v, decimal.Decimal):
        # exact value, scale-insensitive (1.50 == 1.5) but kind-tagged so
        # a Decimal column never matches a float/int column
        return ("d", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("D", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a",) + tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return ("m",) + tuple(
            (k, norm_cell(x)) for k, x in sorted(v.items()))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("s", str(v))


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def _spark_rows(sdf):
    """Collect via Arrow (same path the driver's toPandas uses)."""
    tbl = sdf.toArrow()
    cols = tbl.column_names
    data = [c.to_pylist() for c in tbl.columns]
    return cols, list(zip(*data)) if data else []


def _duck_rows(res):
    tbl = res.arrow()
    cols = tbl.column_names
    data = [c.to_pylist() for c in tbl.columns]
    return cols, list(zip(*data)) if data else []


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols, srows = _spark_rows(sdf)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            dcols, drows = _duck_rows(con.execute(oracles[name]))
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            ms, md = df_multiset(scols, srows), df_multiset(dcols, drows)
            if ms != md:
                diff = [k for k in set(ms) ^ set(md)][:3]
                sonly = [k for k in ms if k not in md][:2]
                donly = [k for k in md if k not in ms][:2]
                problems.append(
                    f"values differ; spark-only={sonly} duck-only={donly}"
                    f" n_diff={len(set(ms) ^ set(md))} sample={diff[:1]}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
