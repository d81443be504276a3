#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB against views over the testdata parquet
tables, and compares: row count, column set, and value-level equality after
sorting columns by name and rows by all columns (the strictest plausible
interpretation of the driver's "row/schema/hash match").

Usage: tools/compare_oracle.py [sfdir] [verify_outdir]
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Sort RAW frames first — the driver's checker does pandas sort_values
    # over the raw cells, which CRASHES on list/ndarray cells (r12's red
    # tp1 row). Reproducing that strictness here means any non-scalar gate
    # output fails locally exactly the way it fails at the driver. (A
    # second sort on the canonicalized values follows below, so the
    # EQUALITY key and the final sort key agree — raw sub-rounding float
    # noise must not be able to reorder ties differently per engine.)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # canonicalize cell values: decimals->str, tz-naive µs ts
    def canon(v):
        if hasattr(v, "as_tuple"):  # Decimal — keep exact repr incl. trailing
            return str(v)           # zeros ("230.50"), the driver is strict
        if isinstance(v, float):
            return round(v, 9) if not math.isnan(v) else "NaN"
        if isinstance(v, pd.Timestamp):
            return v.floor("us").isoformat()
        return v
    for c in df.columns:
        df[c] = df[c].map(canon)
    # uniform string dtype so int32/int64/hugeint etc. compare by value
    df = df.astype(str)
    # re-sort on the CANONICALIZED values: rounding can collapse raw-order
    # ties, and equality must be judged in the same key space as the sort
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    dirs = {d.split("/")[-1] for d in glob.glob(f"{outdir}/*")
            if not d.endswith(".json")}
    names = sorted(dirs | set(oracle))
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output files")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
        except Exception as e:
            # driver-strict crash (e.g. unsortable ndarray cells) FAILS
            # this gate but must not abort the other ~150 comparisons
            print(f"FAIL  {name}: spark output not checkable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP  {name}: no oracle (rows-only check: {len(got)} rows)")
            n_noracle += 1
            continue
        try:
            want = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if set(got.columns) != set(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        eq = got.equals(want)
        if not eq:
            diff = (got != want)
            ncell = int(diff.to_numpy().sum())
            print(f"FAIL  {name}: {ncell} differing cells / {len(got)} rows")
            mask = diff.any(axis=1)
            print("  spark:", got[mask].head(3).to_dict("records"))
            print("  duck :", want[mask].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
