#!/usr/bin/env python3
"""Sharded exact oracle for q_media_audio_neardup at the 1000x replica.

The one-shot oracle SQL materializes ~530M sample rows through two
grouped passes and DuckDB's temp spill exceeds the local disk. Sharding
is EXACT and COMPLETE: only the per-doc hash computation (embarrassingly
per-id) is sharded by id%NSHARDS; the banded candidate join + hamming
verify + EXCEPT-ALL run ONCE over the full 11M-row hash table, so
cross-shard pairs are fully covered. blocks=2 (32-bit keys), matching
GRAFT_MEDIA_NEARDUP_BLOCKS=2 on the engine side.
"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_x1000_r14"
NSHARDS = 16

con = duckdb.connect()
con.execute("PRAGMA temp_directory='/tmp/duck_shard_tmp'")
con.execute("CREATE TABLE wide(id BIGINT, k0 BIGINT, k1 BIGINT)")
for k in range(NSHARDS):
    con.execute(f"""
INSERT INTO wide
WITH ids AS (
  SELECT CAST(doc_id AS BIGINT) AS id
  FROM read_parquet('{SF}/documents.parquet/*.parquet')
  WHERE CAST(doc_id AS BIGINT) % {NSHARDS} = {k}),
corpus AS (
  SELECT id, id AS src, 0 AS pert FROM ids
  UNION ALL
  SELECT id + 1000000000000, id, 1 FROM ids WHERE id % 10 = 0),
samp AS (
  SELECT c.id, gi.i AS i, 64 + c.src % 64 AS n,
         ((c.src % 2003) * (gi.i+3) * (gi.i+3)
           + (c.src % 1999) * (gi.i+5)) % 2003 - 1001
           + CASE WHEN c.pert = 1 AND gi.i = 0 THEN 100 ELSE 0 END AS v
  FROM corpus c, generate_series(0, 127) gi(i)
  WHERE gi.i < 64 + c.src % 64),
en AS (
  SELECT id, (i * 64) // n AS f, sum(v * v) AS e
  FROM samp GROUP BY id, (i * 64) // n),
bits AS (
  SELECT en.id, en.f AS i, CASE WHEN en.e > m.mean THEN 1 ELSE 0 END AS bit
  FROM en JOIN (SELECT id, sum(e) // 64 AS mean FROM en GROUP BY id) m
    ON en.id = m.id),
keys AS (
  SELECT id, i // 32 AS blk,
         sum(bit * (CAST(1 AS BIGINT) << (i % 32))) AS key
  FROM bits GROUP BY id, i // 32)
SELECT id, max(CASE WHEN blk = 0 THEN key END) AS k0,
           max(CASE WHEN blk = 1 THEN key END) AS k1
FROM keys GROUP BY id""")
    print(f"shard {k}: wide rows so far",
          con.execute("SELECT count(*) FROM wide").fetchone()[0], flush=True)

con.execute("""
CREATE TABLE oracle_pairs AS
WITH cand AS (
  SELECT x.id AS a, y.id AS b FROM wide x JOIN wide y
    ON x.k0 = y.k0 AND x.id < y.id
  UNION
  SELECT x.id, y.id FROM wide x JOIN wide y
    ON x.k1 = y.k1 AND x.id < y.id),
ham AS (
  SELECT c.a, c.b,
         bit_count(xor(wa.k0, wb.k0)) + bit_count(xor(wa.k1, wb.k1)) AS hd
  FROM cand c JOIN wide wa ON wa.id = c.a JOIN wide wb ON wb.id = c.b)
SELECT a, b, CAST(hd AS INTEGER) AS hdist FROM ham WHERE hd <= 3""")
n_o = con.execute("SELECT count(*) FROM oracle_pairs").fetchone()[0]
eng = f"read_parquet('{OUT}/q_media_audio_neardup/*.parquet')"
n_e = con.execute(f"SELECT count(*) FROM {eng}").fetchone()[0]
d1 = con.execute(
    f"SELECT count(*) FROM (SELECT * FROM oracle_pairs EXCEPT ALL SELECT a, b, hdist FROM {eng})").fetchone()[0]
d2 = con.execute(
    f"SELECT count(*) FROM (SELECT a, b, hdist FROM {eng} EXCEPT ALL SELECT * FROM oracle_pairs)").fetchone()[0]
verdict = "ok" if (n_o == n_e and d1 == 0 and d2 == 0) else "DIFF"
print(f"q_media_audio_neardup    {verdict} (oracle {n_o} vs engine {n_e} rows, "
      f"EXCEPT-ALL diffs {d1}/{d2}; sharded-hash oracle, blocks=2)")
