#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [name1,name2,...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against the sfDir parquet tables, and compares with the
Spark parquet dump: row count, sorted column names, and a value hash over
columns sorted by name (the driver's protocol).

Every oracle is also TYPE-LINTED via a LIMIT-0 `.arrow()` probe: any
DECIMAL128/HUGEINT output column fails, because the driver's pandas/arrow
path stringifies those as `150.0` vs Spark's BIGINT `150` and the value hash
diverges even when the answers are identical (the r8 q_funnel incident).
Pass `--lint` to run ONLY the type lint (no Spark dump needed beyond
oracle_sql.json).
"""
import sys, json, glob, hashlib
import duckdb

# Arrow type ids the driver's hash protocol cannot round-trip: any decimal
# (DuckDB types sum(int) as DECIMAL128(38,0) == HUGEINT surrogate). Our
# convention is doubles-rounded / counts-cast-BIGINT, so NO oracle should
# ever emit a decimal column.
import pyarrow as pa


def lint_types(con, sql):
    """Return ([(col, type), ...] of hash-protocol-unsafe output columns,
    [oracle column names])."""
    tbl = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow()
    bad = []
    for field in tbl.schema:
        t = field.type
        if pa.types.is_decimal(t):
            bad.append((field.name, str(t)))
    return bad, [f.name for f in tbl.schema]

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in sorted(tuple(str(row[i]) for i in order) for row in rows):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    args = [a for a in sys.argv[1:] if a != "--lint"]
    lint_only = "--lint" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    subset = set(args[2].split(",")) if len(args) > 2 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional schema-parity input: {name: [spark column names]} — when
    # present (written by OracleTypeLintSpec), each oracle's LIMIT-0
    # column set must equal the Spark side's (the driver hashes columns
    # sorted by name, so ANY mismatch is a guaranteed red row)
    spark_cols = {}
    try:
        spark_cols = json.load(open(f"{out_dir}/spark_columns.json"))
    except FileNotFoundError:
        pass
    con = duckdb.connect()
    for t in TABLES:
        if glob.glob(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    for name in sorted(oracle):
        if subset and name not in subset:
            continue
        try:
            bad, ocols = lint_types(con, oracle[name])
        except Exception as e:
            print(f"[typelint] {name:28s} PROBE ERROR: {e}")
            fails += 1
            continue
        schema_ok = True
        if name in spark_cols and sorted(spark_cols[name]) != sorted(ocols):
            print(f"[typelint] {name:28s} COLUMN MISMATCH: "
                  f"spark={sorted(spark_cols[name])} oracle={sorted(ocols)}")
            fails += 1
            schema_ok = False
        if bad:
            print(f"[typelint] {name:28s} UNSAFE OUTPUT TYPES: {bad}")
            fails += 1
        elif lint_only and schema_ok:
            print(f"[typelint] {name:28s} OK")
        if lint_only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[oracle] {name:28s} NO SPARK DUMP")
            fails += 1
            continue
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        s_cols = [d[0] for d in spark_rel.description]
        s_rows = spark_rel.fetchall()
        try:
            duck_rel = con.execute(oracle[name])
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"[oracle] {name:28s} ORACLE SQL ERROR: {e}")
            fails += 1
            continue
        ok_rows = len(s_rows) == len(d_rows)
        ok_schema = sorted(s_cols) == sorted(d_cols)
        ok_hash = ok_schema and table_hash(s_rows, s_cols) == table_hash(
            d_rows, d_cols)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"[oracle] {name:28s} {status} rows={len(s_rows)}/{len(d_rows)}"
              f" schema={ok_schema} hash={ok_hash}")
        if status == "FAIL" and ok_schema and len(s_rows) == len(d_rows):
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            a = sorted(tuple(str(r[i]) for i in order) for r in s_rows)
            b = sorted(tuple(str(r[i]) for i in order) for r in d_rows)
            for x, y in zip(a, b):
                if x != y:
                    print(f"         spark={x}\n         duck ={y}")
                    break
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
