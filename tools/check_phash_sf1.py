#!/usr/bin/env python3
"""One-off sf1 checker for multimodal_phash_pairs: check_oracle's single
query keeps BOTH band-join sides' 3.3B-term phash-arithmetic subtrees
alive and spills past local disk; this runner materializes the per-doc
hash table first (TEMP TABLE), then runs the identical banding/cap/pair
SQL over it. Semantics are the verbatim oracle, split at the ph
boundary. Usage: check_phash_sf1.py <sfDir> <verifyOutDir>
"""
import json, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))["multimodal_phash_pairs"]
# split: everything up to the bk CTE is the per-doc hash derivation
idx = sql.index("bk AS")
head = sql[:idx].rstrip().rstrip(",")          # WITH t AS (...), ..., ph AS (...)
tail = sql[idx:]                                # bk AS (...), ok AS (...) SELECT ...
con.sql(f"CREATE TEMP TABLE ph_mat AS {head} SELECT doc_id, phash FROM ph")
n = con.sql("SELECT count(*) FROM ph_mat").fetchone()[0]
print(f"ph materialized: {n} docs")
o = con.sql("WITH ph AS (SELECT * FROM ph_mat), " + tail)
ocols, orows = [c.lower() for c in o.columns], o.fetchall()
g = con.sql(f"SELECT * FROM '{out_dir}/multimodal_phash_pairs/*.parquet'")
gcols, grows = [c.lower() for c in g.columns], g.fetchall()
if sorted(ocols) != sorted(gcols):
    print(f"FAIL cols {sorted(ocols)} vs {sorted(gcols)}"); sys.exit(1)
if len(orows) != len(grows):
    print(f"FAIL rows oracle={len(orows)} got={len(grows)}"); sys.exit(1)
order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
order_g = sorted(range(len(gcols)), key=lambda i: gcols[i])
ko = sorted([tuple(r[i] for i in order_o) for r in orows])
kg = sorted([tuple(r[i] for i in order_g) for r in grows])
print("HASH MATCH" if ko == kg else "FAIL value mismatch")
sys.exit(0 if ko == kg else 1)
