#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage:  python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by `graft.Verify`), runs each
oracle SQL in DuckDB with the sfDir parquet tables registered as views, loads
the Spark result parquet from <verifyOutDir>/<name>/, canonicalizes both
(columns sorted by name), and compares cell-by-cell with strict equality
(floats via repr). Mirrors the strictest plausible driver compare so that
passing here ⇒ passing the driver's hash match.

Dev tooling only — NOT part of the graft library (driver-side python deps).
"""
import sys, os, json, glob, math, threading

import duckdb

# Per-oracle wall-time budget (seconds). Every healthy oracle completes in
# well under 1 s at sf0.01; a pathological one (e.g. a multiply-referenced
# CTE that DuckDB inlines geometrically — the round-6 embed_pca_power
# incident, >15 min of pinned CPU) must fail THAT query, never hang the
# whole artifact. Override with ORACLE_BUDGET_SEC.
ORACLE_BUDGET_SEC = float(os.environ.get("ORACLE_BUDGET_SEC", "60"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(cell):
    if isinstance(cell, float):
        if math.isnan(cell):
            return "NaN"
        return repr(cell)
    if isinstance(cell, list):
        return "[" + ",".join(canon(x) for x in cell) + "]"
    if isinstance(cell, dict):
        return "{" + ",".join(f"{k}:{canon(v)}" for k, v in cell.items()) + "}"
    return repr(cell)


def _type_class(t):
    """Collapse an arrow type to the VALUE CLASS the driver's type-tagged
    hash distinguishes. Width differences inside a class (int8/int32/
    uint32 vs int64) are empirically benign — three such columns shipped
    driver-green for rounds — while cross-class mismatches (decimal128 vs
    int64, the round-7/8 agg_rate_ci incident) fail the driver hash even
    on identical values."""
    import pyarrow.types as pat
    # A dictionary-encoded column hashes by its VALUES — unwrap to the
    # value type so e.g. dictionary<string> classes as "string" instead of
    # spuriously failing an exact-string compare against plain string.
    if pat.is_dictionary(t):
        t = t.value_type
    for cls, pred in [
            ("decimal", pat.is_decimal), ("integer", pat.is_integer),
            ("floating", pat.is_floating), ("boolean", pat.is_boolean),
            ("string", lambda x: pat.is_string(x) or pat.is_large_string(x)),
            ("binary", lambda x: pat.is_binary(x) or pat.is_large_binary(x)),
            ("date", pat.is_date), ("timestamp", pat.is_timestamp),
            ("list", lambda x: pat.is_list(x) or pat.is_large_list(x)),
            ("struct", pat.is_struct), ("map", pat.is_map),
            ("null", pat.is_null)]:
        if pred(t):
            return cls
    return str(t)


def type_audit(o_schema, s_schema):
    """Arrow-schema audit: DuckDB's SQL dialect silently lands in different
    arrow types than the engine's parquet output (sum(BIGINT) -> HUGEINT =
    decimal128(38,0); regr_count -> uint32; ...), and a type-tagged driver
    hash fails on a class mismatch even when every VALUE matches — the
    repr-based compare below cannot see it. Fail any oracle output column
    whose arrow VALUE CLASS differs from the Spark side's (a `null`-class
    oracle column — a bare NULL literal — is exempt: it carries no type
    information and hashes by value). Schemas come from the SAME arrow
    result `fetch` already materialized — no second SQL execution (a
    LIMIT-0 re-run still materializes AS MATERIALIZED CTEs and roughly
    doubled wall-time for the heavy unrolled oracles). Returns [] if
    clean."""
    s_types = {f.name: f.type for f in s_schema}
    bad = []
    for f in o_schema:
        st = s_types.get(f.name)
        if st is None:
            continue  # column-name drift is caught by the value compare
        oc, sc = _type_class(f.type), _type_class(st)
        if oc != sc and oc != "null":
            bad.append(f"{f.name}: oracle={f.type} ({oc}) vs spark={st} ({sc}) "
                       f"(CAST the oracle expr to the Spark output class)")
    return bad


def fetch(con, sql, budget=None):
    """Execute once, return (sorted cols, canonical rows, arrow schema).
    The arrow result feeds BOTH the value compare and the type audit, so
    each oracle SQL runs exactly once."""
    timer = None
    if budget:
        timer = threading.Timer(budget, con.interrupt)
        timer.daemon = True
        timer.start()
    try:
        tbl = con.execute(sql).arrow()
    except duckdb.InterruptException:
        raise TimeoutError(f"oracle exceeded {budget:.0f}s wall-time budget")
    finally:
        if timer:
            timer.cancel()
    cols = tbl.schema.names
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    rows = [tuple(canon(d[c]) for c in names) for d in tbl.to_pylist()]
    return names, rows, tbl.schema


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a directory of part files (e.g. the 10x
            # replica set from tools/ScaleGen) rather than a single file
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            o_cols, o_rows, o_schema = fetch(con, oracles[name],
                                             budget=ORACLE_BUDGET_SEC)
        except TimeoutError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            s_cols, s_rows, s_schema = fetch(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: spark parquet load error: {e}")
            n_fail += 1
            continue
        try:
            type_bad = type_audit(o_schema, s_schema)
        except Exception as e:
            print(f"FAIL {name}: type audit error: {e}")
            n_fail += 1
            continue
        if type_bad:
            print(f"FAIL {name}: oracle output type leak (driver hash is "
                  f"type-tagged): {'; '.join(type_bad)}")
            n_fail += 1
            continue
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ: oracle={o_cols} spark={s_cols}")
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rowcount differs: oracle={len(o_rows)} spark={len(s_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(o_rows, s_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(o_rows)} rows differ; first at {i}:")
            print(f"      cols : {o_cols}")
            print(f"      oracle: {a}")
            print(f"      spark : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
