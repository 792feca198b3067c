"""Driver-style oracle comparison for selected queries at sf0.01."""
import sys
import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entry

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

names = sys.argv[1:] or [
    "docs_by_lang", "events_by_type", "events_hourly", "events_sessionize",
    "top_users_by_value", "tpch_q1", "revenue_by_nation",
]
if names == ["--all"]:
    import __ray_entry__ as _e
    names = sorted(_e.oracle_sql())

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = entry.queries()
oracles = entry.oracle_sql()

def norm(df):
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in names:
    res = qs[name](SF)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    mine = norm(pd.DataFrame(res))
    orc = norm(con.execute(oracles[name]).df())
    ok_rows = len(mine) == len(orc)
    ok_dtype = list(map(str, mine.dtypes)) == list(map(str, orc.dtypes))
    ok_vals = ok_rows and ok_dtype and mine.equals(orc)
    status = "OK" if (ok_rows and ok_dtype and ok_vals) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{name}: {status} rows={len(mine)}/{len(orc)} "
          f"dtypes_match={ok_dtype} vals={ok_vals}")
    if not ok_dtype:
        print("  mine:", dict(zip(mine.columns, map(str, mine.dtypes))))
        print("  orc :", dict(zip(orc.columns, map(str, orc.dtypes))))
    elif not ok_vals and ok_rows:
        neq = (mine != orc).any()
        print("  differing cols:", list(neq[neq].index))

ray.shutdown()
sys.exit(1 if fails else 0)
