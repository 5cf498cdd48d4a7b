#!/usr/bin/env python3
"""Local replay of the driver's correctness gate (SURVEY.md §5.2).

Usage: oracle_check.py <sfDir> <verifyOutDir> [keys...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with
bare table names viewed over <sfDir>/*.parquet, loads the Spark result
parquet from <verifyOutDir>/<key>/, sorts columns by name on both sides,
and compares row-by-row for EXACT equality (the driver hash-compares, so
"close" is not enough). Queries without oracle SQL get a rows>0 check.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Type-strict normalization: int vs float vs str vs timestamp are
    distinct even when values are numerically equal (the driver's hash
    may stringify, where 5 != 5.0)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    return ("s", v) if isinstance(v, str) else (type(v).__name__, v)


def type_class(t):
    """Collapse an Arrow type to the class the driver's type-strict hash
    distinguishes. DuckDB's Python fetchall() silently narrows HUGEINT to
    int (which hid the sim_pq widening bug in round 8); over Arrow,
    HUGEINT surfaces as decimal128(38,0) and stays distinguishable."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return str(t)  # exact width: int32 vs int64 is a driver mismatch
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{type_class(t.field(i).type)}"
                         for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_class(t.key_type)},{type_class(t.item_type)}>"
    return str(t)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    result_dirs = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    failures = []
    for key in result_dirs:
        if only and key not in only:
            continue
        files = glob.glob(os.path.join(out_dir, key, "*.parquet"))
        if not files:
            failures.append((key, "no spark output parquet"))
            continue
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{files[0]}')")
        spark_cols = [c[0] for c in spark_rel.description]
        spark_rows = spark_rel.fetchall()
        if key not in oracles:
            status = "rows-only"
            ok = len(spark_rows) > 0
            print(f"[{'OK ' if ok else 'FAIL'}] {key}: {len(spark_rows)} rows ({status})")
            if not ok:
                failures.append((key, "0 rows (rows-only check)"))
            continue
        try:
            oracle_rel = con.execute(oracles[key])
            oracle_cols = [c[0] for c in oracle_rel.description]
            oracle_rows = oracle_rel.fetchall()
        except Exception as e:
            failures.append((key, f"oracle SQL error: {e}"))
            print(f"[FAIL] {key}: oracle SQL error: {e}")
            continue
        if sorted(spark_cols) != sorted(oracle_cols):
            failures.append((key, f"schema mismatch spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"))
            print(f"[FAIL] {key}: schema mismatch\n  spark : {sorted(spark_cols)}\n  oracle: {sorted(oracle_cols)}")
            continue
        # Type gate over Arrow: catches DuckDB implicit widening
        # (sum(BIGINT) -> HUGEINT, avg -> DOUBLE vs DECIMAL, ...) that
        # fetchall() hides but the driver's hash rejects. LIMIT 0 wrap
        # gets the result schema without rerunning the oracle.
        s_schema = con.sql(
            f"SELECT * FROM read_parquet('{files[0]}') LIMIT 0").arrow().schema
        o_schema = con.sql(
            f"SELECT * FROM ({oracles[key]}) LIMIT 0").arrow().schema
        s_types = {f.name: type_class(f.type) for f in s_schema}
        o_types = {f.name: type_class(f.type) for f in o_schema}
        type_diffs = [(c, s_types[c], o_types[c])
                      for c in sorted(spark_cols)
                      if s_types.get(c) != o_types.get(c)]
        if type_diffs:
            failures.append((key, f"type mismatch {type_diffs}"))
            for c, st, ot in type_diffs:
                print(f"[FAIL] {key}: column `{c}` type spark={st} oracle={ot}")
            continue
        # reorder both to sorted column order (driver sorts columns by name)
        sperm = [spark_cols.index(c) for c in sorted(spark_cols)]
        operm = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        s_rows = [tuple(norm(r[i]) for i in sperm) for r in spark_rows]
        o_rows = [tuple(norm(r[i]) for i in operm) for r in oracle_rows]
        if len(s_rows) != len(o_rows):
            failures.append((key, f"row count spark={len(s_rows)} oracle={len(o_rows)}"))
            print(f"[FAIL] {key}: row count spark={len(s_rows)} oracle={len(o_rows)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, o_rows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failures.append((key, f"first diff at row {bad[0]}"))
            print(f"[FAIL] {key}: first diff at row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}\n  cols  : {sorted(spark_cols)}")
        else:
            print(f"[OK ] {key}: {len(s_rows)} rows exact-match")

    missing = [k for k in oracles if k not in result_dirs]
    for k in missing:
        if not only or k in only:
            failures.append((k, "oracle declared but no spark output"))
            print(f"[FAIL] {k}: oracle declared but no spark output")
    print(f"\n{len(failures)} failure(s)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
