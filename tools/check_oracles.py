"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin over an sf dir, compare
row count, column names, and order-insensitive value content.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    # dtype-STRICT: no int/float widening here — the driver's value hash
    # is dtype-sensitive, and round 3 shipped a red row (asof_join
    # float64-widened ids) that this tool's old int64/float64 coercion
    # masked. Local green must predict driver green.
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import __ray_entry__ as e

    qs, oras = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                got = res.to_pandas()
            else:
                got = pd.DataFrame(res)
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if name not in oras:
            print(f"ok   {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            want = con.execute(oras[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failed.append(name)
            continue
        dt_bad = {
            c: (str(g[c].dtype), str(w[c].dtype))
            for c in g.columns
            if str(g[c].dtype) != str(w[c].dtype)
        }
        if dt_bad:
            print(f"FAIL {name}: dtypes differ (ray, oracle): {dt_bad}")
            failed.append(name)
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failed.append(name)
            continue
        eq = True
        for c in g.columns:
            if g[c].dtype == "float64":
                same = (
                    (g[c].isna() & w[c].isna())
                    | (g[c] == w[c])
                )
                if not same.all():
                    eq = False
                    break
            else:
                a = g[c].fillna("\0") if g[c].dtype == object else g[c]
                b = w[c].fillna("\0") if w[c].dtype == object else w[c]
                if not (a == b).all():
                    eq = False
                    break
        if not eq:
            bad = g[c] != w[c]
            print(f"FAIL {name}: values differ in column {c}")
            print("  ray:", g[bad].head(3).to_dict("records"))
            print("  ora:", w[bad].head(3).to_dict("records"))
            failed.append(name)
        else:
            print(f"ok   {name}: {len(g)} rows match ({time.time()-t0:.1f}s)")
    print("\n", "ALL OK" if not failed else f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
