"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row count, column names, and
an order-insensitive value hash (rows sorted by all columns, columns sorted
by name, floats stringified at 12 significant digits). Use while iterating:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.floor("us").astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df


def stringify(df: pd.DataFrame) -> list[str]:
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "<NULL>"
        if isinstance(v, float):
            return f"{v:.12g}"
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, (np.floating,)):
            return f"{float(v):.12g}"
        if isinstance(v, (np.integer,)):
            return str(int(v))
        return str(v)

    rows = ["|".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from cobalt_duckdb_spark.session import get_spark
    from cobalt_duckdb_spark.queries import queries, oracle_sql

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            spark_pdf = canonicalize(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(spark_pdf)} (rows-only, no oracle)")
            continue
        try:
            duck_pdf = canonicalize(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        problems = []
        if len(spark_pdf) != len(duck_pdf):
            problems.append(f"rows {len(spark_pdf)} != {len(duck_pdf)}")
        if list(spark_pdf.columns) != list(duck_pdf.columns):
            problems.append(
                f"cols {list(spark_pdf.columns)} != {list(duck_pdf.columns)}"
            )
        if not problems and stringify(spark_pdf) != stringify(duck_pdf):
            problems.append("value hash mismatch")
            s, d = stringify(spark_pdf), stringify(duck_pdf)
            diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
            for a, b in diff:
                print(f"  spark: {a}\n  duck : {b}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: rows={len(spark_pdf)} hash-match")

    print(f"\n{n_run - len(failures)}/{n_run} queries match ({len(qs)} registered)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
