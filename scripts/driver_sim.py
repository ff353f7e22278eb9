"""Simulate the graft driver's verify pass against __ray_entry__.py.

Usage: python scripts/driver_sim.py [sf_dir] [num_cpus]

Mirrors the driver: ray.init FIRST, then import __ray_entry__, call
entry(), then run each queries()[name](sf_dir) side-by-side with
oracle_sql()[name] in DuckDB and compare row count, schema (column
names), and an order-insensitive value hash (columns sorted by name,
rows sorted, values stringified).
"""

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd
import ray
import ray.data

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# MUST default to the driver's own CPU count (32): every CPU-dependent
# sizing path (join partitions, pool sizes) has to be exercised at the
# cluster size the driver actually uses — the r2 dedup_minhash_lsh crash
# shipped precisely because driver_sim ran at 8 while the driver ran 32.
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> tuple[int, list, str]:
    df = df[sorted(df.columns)]
    s = df.astype(str).sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(s.to_csv(index=False).encode()).hexdigest()[:16]
    return len(df), sorted(df.columns), h


def main():
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    t0 = time.time()
    e = to_pandas(mod.entry())
    print(f"entry(): {len(e)} rows, cols={list(e.columns)}, {time.time()-t0:.1f}s")
    assert len(e) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    only = os.environ.get("DRIVER_SIM_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        qs = {n: qs[n] for n in names}
    n_fail = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = to_pandas(fn(SF_DIR))
        except Exception as ex:
            print(f"FAIL  {name}: raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle) {elapsed:.1f}s")
            continue
        exp = con.sql(oracles[name]).df()
        g, x = canon(got), canon(exp)
        status = "OK  " if g == x else "FAIL"
        if g != x:
            n_fail += 1
        print(
            f"{status}  {name}: ray(rows={g[0]}, hash={g[2]}) vs "
            f"oracle(rows={x[0]}, hash={x[2]}) {elapsed:.1f}s"
        )
        if g[1] != x[1]:
            print(f"      schema mismatch: {g[1]} vs {x[1]}")
    ray.shutdown()
    print("RESULT:", "FAIL" if n_fail else "PASS", f"({len(qs)} queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
