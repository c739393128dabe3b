"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side at a given sf, compare row-count + schema +
order-insensitive values. Usage: python tools/check_oracles.py [sf_dir]."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def to_pandas(result):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(mine)} (no oracle)")
            continue
        try:
            ref = normalize(con.execute(sql).df())
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {exc}")
            failures += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            failures += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            failures += 1
            continue
        # order-insensitive value compare (exact)
        m = mine.astype(str).values.tolist()
        r = ref.astype(str).values.tolist()
        if sorted(map(tuple, m)) != sorted(map(tuple, r)):
            print(f"FAIL {name}: value mismatch")
            diff = [
                (a, b) for a, b in zip(sorted(map(tuple, m)), sorted(map(tuple, r))) if a != b
            ][:3]
            for a, b in diff:
                print(f"   mine={a}\n   ref ={b}")
            failures += 1
            continue
        print(f"PASS {name}: rows={len(mine)}")

    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
