#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ (Spark parquet output) and <outDir>/oracle_sql.json,
runs each oracle SQL in DuckDB over the sfDir parquet tables, and compares:
row count, column names (sorted), and values (rows sorted by all columns).
Floats compared exactly AND with tolerance so we can see the margin.
"""
import sys, json, glob, math
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def akind(t: pa.DataType) -> str:
    """Arrow-level type KIND, the granularity the driver's hash cares
    about. Crucially DECIMAL is its own kind — DuckDB's fetchdf silently
    converts decimal128→float64, which blinded the r12 local gate to the
    q_sql_dash_alerts decimal(31,6)-vs-double hash failure (values equal,
    canonical serialization '30.000000' != '30.0')."""
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + akind(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)


def arrow_type_problems(spark_schema: pa.Schema, oracle_schema: pa.Schema):
    """Compare column types at the ARROW level (pre-pandas), so decimal
    vs double — which the driver's canonical-value hash distinguishes —
    fails locally too.

    Asymmetry calibrated against driver behavior observed in r12: the
    driver normalizes the ORACLE side the way DuckDB fetchdf does
    (decimal→float64, date32→datetime64), but hashes the SPARK side
    with type fidelity (spark decimal(31,6) vs oracle double was the one
    r12 red row while oracle decimal(2,1) vs spark double stayed green).
    Net effect: a decimal column in SPARK gate output is always a FAIL."""
    problems = []

    def norm_oracle(k):
        if k.startswith("decimal"):
            return "float"
        if k == "date":
            return "timestamp"
        return k

    def norm_spark(k):
        # spark date vs oracle DATE(→timestamp) has always hashed green;
        # decimals stay strict — that's the proven failure class
        if k == "date":
            return "timestamp"
        return k

    o = {f.name: f.type for f in oracle_schema}
    for f in spark_schema:
        if f.name not in o:
            continue  # column-name mismatch reported elsewhere
        ks, ko = norm_spark(akind(f.type)), norm_oracle(akind(o[f.name]))
        if ks != ko:
            problems.append(
                f"col {f.name}: ARROW type kind mismatch spark={f.type} "
                f"({ks}) oracle={o[f.name]} ({ko}) — driver hashes canonical "
                f"values, so this is a hash FAIL even if values are equal")
    return problems

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a total sort order across mixed/NaN columns
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)

def compare(name, spark_df, oracle_df):
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
        return problems, None
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differ: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems, None
    a, b = canon(spark_df), canon(oracle_df)
    # dtype-kind-strict: the driver hashes canonical values, so int64 vs
    # float64 (e.g. DuckDB SUM(int)->HUGEINT->float64) mismatches even when
    # values are numerically equal. Width-only differences (int32 vs int64)
    # canonicalize identically, so compare the dtype KIND, not the width.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and not ({ka, kb} <= {"i", "u"}):
            problems.append(
                f"col {c}: DTYPE kind mismatch spark={a[c].dtype} oracle={b[c].dtype}")
    max_rel = 0.0
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xn = pd.to_numeric(x, errors="coerce")
            yn = pd.to_numeric(y, errors="coerce")
            both_nan = xn.isna() & yn.isna()
            # -0.0-strict: the driver hashes canonical values, where
            # -0.0 != +0.0 (float == treats them equal and would hide it)
            sign_eq = np.signbit(xn.fillna(0.0).to_numpy()) == \
                np.signbit(yn.fillna(0.0).to_numpy())
            eq = ((xn == yn) & sign_eq) | both_nan
            if not eq.all():
                diff = (xn - yn).abs()
                denom = yn.abs().clip(lower=1e-12)
                rel = (diff / denom).max()
                max_rel = max(max_rel, 0 if math.isnan(rel) else rel)
                nbad = int((~eq).sum())
                i = (~eq).idxmax()
                problems.append(
                    f"col {c}: {nbad} value diffs (exact), max_rel={rel:.3e}, "
                    f"e.g. row{i}: spark={xn[i]!r} oracle={yn[i]!r}")
        else:
            xs, ys = x.astype(str), y.astype(str)
            eq = xs == ys
            if not eq.all():
                nbad = int((~eq).sum())
                i = (~eq).idxmax()
                problems.append(f"col {c}: {nbad} value diffs, e.g. row{i}: spark={x[i]!r} oracle={y[i]!r}")
    return problems, max_rel

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = ["NO SPARK OUTPUT"]
            continue
        try:
            # pyarrow read preserves decimal128 — DuckDB fetchdf would
            # normalize it to float64 and hide driver-visible type drift
            spark_tbl = pq.read_table(files)
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            results[name] = [f"spark output read failed: {e}"]
            continue
        try:
            # execute ONCE and derive both views from the same result:
            # a second execution doubles oracle-side gate cost and could
            # diverge from the hashed frame on a nondeterministic query.
            # to_pandas must mirror fetchdf's normalization (decimal →
            # float64, date32 → datetime64[us]) or compare() would see
            # object-dtype Decimals/dates that fetchdf never produced;
            # arrow_type_problems still sees the ORIGINAL arrow schema.
            oracle_res = con.execute(sql).arrow()
            norm = pa.schema([
                pa.field(f.name, pa.float64()) if pa.types.is_decimal(f.type)
                else pa.field(f.name, pa.timestamp("us")) if pa.types.is_date(f.type)
                else f for f in oracle_res.schema])
            oracle_df = oracle_res.cast(norm).to_pandas()
        except Exception as e:
            results[name] = [f"ORACLE SQL failed: {e}"]
            continue
        problems, max_rel = compare(name, spark_df, oracle_df)
        problems += arrow_type_problems(spark_tbl.schema, oracle_res.schema)
        results[name] = problems
    npass = sum(1 for p in results.values() if not p)
    print(f"=== {npass}/{len(results)} PASS ===")
    for name, problems in sorted(results.items()):
        status = "PASS" if not problems else "FAIL"
        print(f"[{status}] {name}")
        for p in problems:
            print(f"    {p}")
    # also note queries lacking oracle (rows-only)
    sys.exit(0 if npass == len(results) else 1)

if __name__ == "__main__":
    main()
