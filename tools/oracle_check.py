#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [name1,name2,...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against the sfDir parquet tables, and compares with the
Spark parquet dump: row count, sorted column names, and a value hash over
columns sorted by name (the driver's protocol).
"""
import sys, json, glob, hashlib
import duckdb

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
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        if glob.glob(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    for name in sorted(oracle):
        if subset and name not in subset:
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
