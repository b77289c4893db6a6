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


BATCH_ROWS = 65536


def row_stream(reader, names):
    """Canonical row tuples (columns in sorted-name order) from a pyarrow
    RecordBatchReader, one batch in memory at a time."""
    for batch in reader:
        for d in batch.to_pylist():
            yield tuple(canon(d[c]) for c in names)


# Row-count threshold above which the per-row Python compare switches to
# the in-DuckDB multiset-hash compare (the driver's own strategy). The
# streaming repr() loop tops out around 50k rows/s/side — a 60M-row dump
# (the 100× replica scan/proj/scalar families) cannot finish inside any
# sane budget, while DuckDB hashes it in seconds. Default: disabled
# (exact row compare everywhere, the strictest form).
ORACLE_HASH_MIN_ROWS = float(os.environ.get("ORACLE_HASH_MIN_ROWS", "inf"))

_SQL_CLASS = [
    ("decimal", ("DECIMAL", "HUGEINT", "UHUGEINT")),
    ("integer", ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
                 "USMALLINT", "UINTEGER", "UBIGINT", "INT")),
    ("floating", ("FLOAT", "REAL", "DOUBLE")),
    ("boolean", ("BOOLEAN",)),
    ("string", ("VARCHAR", "CHAR", "TEXT", "ENUM")),
    ("binary", ("BLOB", "BYTEA")),
    ("date", ("DATE",)),
    ("timestamp", ("TIMESTAMP", "DATETIME")),
    ("struct", ("STRUCT",)),
    ("map", ("MAP",)),
]


def _sql_type_class(t):
    """DuckDB type-name → the same value classes _type_class derives from
    arrow types (HUGEINT lands in arrow as decimal128, hence 'decimal')."""
    u = t.upper()
    if u.endswith("[]"):
        return "list"
    for cls, names in _SQL_CLASS:
        if any(u.startswith(n) for n in names):
            return cls
    return u


def _canon_cast(col, t):
    """Canonical per-class cast so width differences inside a value class
    (int32 vs int64, float vs double, µs vs ns timestamps) hash alike —
    the same widths the driver's type-tagged hash treats as one class."""
    q, u = f'"{col}"', t.upper()
    cls = _sql_type_class(t)
    if cls == "integer":
        return f"CAST({q} AS BIGINT)"
    if cls == "floating":
        return f"CAST({q} AS DOUBLE)"
    if cls == "timestamp":
        return f"CAST({q} AS TIMESTAMP)"
    if cls == "list":
        inner = _sql_type_class(u[:-2])
        if inner == "integer":
            return f"CAST({q} AS BIGINT[])"
        if inner == "floating":
            return f"CAST({q} AS DOUBLE[])"
    return q


def compare_hash(con, name, sql, spark_glob, budget):
    """Multiset-hash compare for dumps too large for the Python row loop:
    each side reduces to (count, sum-of-row-hashes) over canonically-cast
    columns in ONE streaming DuckDB aggregate — no materialization (a
    first temp-table version spilled ~50 GB of wide-string 60M-row
    intermediates and OOM-killed the process; an aggregate over a
    subquery streams in constant memory, and DuckDB drops the subquery's
    now-unobservable ORDER BY, skipping the 60M-row sort entirely).
    sum(hash) is ORDER-INSENSITIVE (duplicates still count: sums add,
    unlike xor): row ordering is separately guaranteed by the total-order
    ORDER BY convention and checked exactly by the row compare at the
    smaller SFs; this mode proves value/multiset equality at volumes the
    row loop cannot reach. Type audit runs on the raw (pre-cast) DuckDB
    types — from plan-only DESCRIBEs — with the same value-class rules."""
    timer = threading.Timer(budget, con.interrupt)
    timer.daemon = True
    timer.start()
    try:
        spark_sql = f"SELECT * FROM read_parquet('{spark_glob}')"
        o_types = {r[0]: r[1]
                   for r in con.execute(f"DESCRIBE ({sql})").fetchall()}
        s_types = {r[0]: r[1]
                   for r in con.execute(f"DESCRIBE ({spark_sql})").fetchall()}
        if sorted(o_types) != sorted(s_types):
            return False, (f"columns differ: oracle={sorted(o_types)} "
                           f"spark={sorted(s_types)}")
        bad = []
        for c in sorted(o_types):
            oc, sc = _sql_type_class(o_types[c]), _sql_type_class(s_types[c])
            if oc != sc and o_types[c].upper() != "NULL":
                bad.append(f"{c}: oracle={o_types[c]} ({oc}) vs "
                           f"spark={s_types[c]} ({sc})")
        if bad:
            return False, ("oracle output type leak (driver hash is "
                           f"type-tagged): {'; '.join(bad)}")
        def side(q, types):
            exprs = ", ".join(_canon_cast(c, types[c]) for c in sorted(types))
            return con.execute(
                f"SELECT count(*), sum(CAST(hash({exprs}) AS HUGEINT)) "
                f"FROM ({q}) _q").fetchone()
        on, oh = side(sql, o_types)
        sn, sh = side(spark_sql, s_types)
        if on != sn:
            return False, f"rowcount differs: oracle={on} spark={sn}"
        if oh != sh:
            return False, (f"multiset hash differs over {on} rows "
                           f"(values differ; run the exact row compare "
                           f"at a smaller SF to localize)")
        return True, f"({on} rows, multiset-hash)"
    except duckdb.InterruptException:
        return False, f"oracle exceeded {budget:.0f}s wall-time budget"
    finally:
        timer.cancel()


def compare_one(con, con_s, name, sql, spark_glob, budget):
    """Order-sensitive streaming compare of one oracle vs one Spark dump.

    Both sides stream as arrow record batches (bounded memory — the 100×
    replica surface includes 60M-row dumps that would need ~40 GB/side
    fully materialized) on SEPARATE connections (a duckdb connection
    allows one active streaming result). The budget timer spans the whole
    per-query compare and interrupts both connections.

    Returns (ok: bool, message: str)."""
    timer = threading.Timer(budget, lambda: (con.interrupt(), con_s.interrupt()))
    timer.daemon = True
    timer.start()
    try:
        o_reader = con.execute(sql).fetch_record_batch(BATCH_ROWS)
        s_reader = con_s.execute(
            f"SELECT * FROM read_parquet('{spark_glob}')"
        ).fetch_record_batch(BATCH_ROWS)
        type_bad = type_audit(o_reader.schema, s_reader.schema)
        if type_bad:
            return False, ("oracle output type leak (driver hash is "
                           f"type-tagged): {'; '.join(type_bad)}")
        o_cols = sorted(o_reader.schema.names)
        s_cols = sorted(s_reader.schema.names)
        if o_cols != s_cols:
            return False, f"columns differ: oracle={o_cols} spark={s_cols}"
        sentinel = object()
        import itertools
        n = n_bad = 0
        first = None
        for a, b in itertools.zip_longest(
                row_stream(o_reader, o_cols), row_stream(s_reader, s_cols),
                fillvalue=sentinel):
            if a is sentinel or b is sentinel:
                side = "spark" if a is sentinel else "oracle"
                return False, (f"rowcount differs: {side} has extra rows "
                               f"beyond {n} (first extra: "
                               f"{b if a is sentinel else a})")
            if a != b:
                n_bad += 1
                if first is None:
                    first = (n, a, b)
            n += 1
        if n_bad:
            i, a, b = first
            return False, (f"{n_bad}/{n} rows differ; first at {i}:\n"
                           f"      cols : {o_cols}\n"
                           f"      oracle: {a}\n"
                           f"      spark : {b}")
        return True, f"({n} rows)"
    except duckdb.InterruptException:
        return False, f"oracle exceeded {budget:.0f}s wall-time budget"
    finally:
        timer.cancel()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con_s = duckdb.connect()  # spark-dump side of the streaming compare
    # Giant-replay knobs (100×-replica runs): by default DuckDB spills to
    # .tmp under cwd — which filled the root partition mid-oracle on the
    # unrolled graph replays — and sizes its memory limit from the host.
    # ORACLE_TEMP_DIR points the spill at a volume with headroom;
    # ORACLE_MEMORY_LIMIT (e.g. "48GB") caps the hash tables so the heavy
    # oracles spill instead of OOM-killing the process.
    tmp_dir = os.environ.get("ORACLE_TEMP_DIR")
    mem_lim = os.environ.get("ORACLE_MEMORY_LIMIT")
    for c in (con, con_s):
        if tmp_dir:
            os.makedirs(tmp_dir, exist_ok=True)
            c.execute(f"SET temp_directory='{tmp_dir}'")
        if mem_lim:
            c.execute(f"SET memory_limit='{mem_lim}'")
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
            glob_pat = f"{out_dir}/{name}/*.parquet"
            # parquet-metadata row count (no scan) picks the compare mode
            n_spark = con_s.execute(
                f"SELECT count(*) FROM read_parquet('{glob_pat}')").fetchone()[0]
            if n_spark >= ORACLE_HASH_MIN_ROWS:
                ok, msg = compare_hash(con, name, oracles[name], glob_pat,
                                       ORACLE_BUDGET_SEC)
            else:
                ok, msg = compare_one(con, con_s, name, oracles[name],
                                      glob_pat, ORACLE_BUDGET_SEC)
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                msg = f"oracle exceeded {ORACLE_BUDGET_SEC:.0f}s wall-time budget"
            else:
                msg = f"oracle SQL error: {e}"
            ok = False
        if ok:
            print(f"PASS {name} {msg}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        sys.stdout.flush()
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
