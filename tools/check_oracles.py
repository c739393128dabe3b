"""Driver-mimic: run queries() and oracle_sql() side-by-side at sf0.01 and
compare rows / schema / values (columns sorted by name, exact equality).

Usage: python tools/check_oracles.py [query ...]   (default: all with oracles)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = sys.argv[1:] or [n for n in qs if n in oracles]
    failed = []
    for name in names:
        try:
            mine = to_pandas(qs[name](SF_DIR)).reset_index(drop=True)
            oracle = con.execute(oracles[name]).df().reset_index(drop=True)
            mine = mine[sorted(mine.columns)]
            oracle = oracle[sorted(oracle.columns)]
            rows = len(mine) == len(oracle)
            schema = list(mine.columns) == list(oracle.columns)
            values = rows and schema
            if values:
                for c in mine.columns:
                    a, b = mine[c], oracle[c]
                    try:
                        eq = (a.to_numpy() == b.to_numpy()).all()
                    except Exception:
                        eq = a.astype(str).equals(b.astype(str))
                    if not eq:
                        values = False
                        print(f"  [{name}] column {c} differs:")
                        neq = a.astype(str) != b.astype(str)
                        print(pd.DataFrame({"mine": a[neq], "oracle": b[neq]}).head())
                        break
            status = "OK" if (rows and schema and values) else "FAIL"
            if status == "FAIL":
                failed.append(name)
            print(
                f"{status:4} {name}: rows={len(mine)}/{len(oracle)} "
                f"schema={'ok' if schema else list(mine.columns)}"
            )
        except Exception as e:
            failed.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
