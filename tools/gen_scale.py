#!/usr/bin/env python3
"""Generate a ~Nx scale replica of an sf directory for the BENCH slope
point (bench-only — correctness oracles always run on driver testdata).

Each replica i shifts every entity key by i*OFFSET so replicas are
disjoint; content columns are decorrelated so similarity/dedup workloads
keep their selectivity instead of exploding quadratically:

- documents.text: for i>0, a replica-unique token is inserted every 5
  words. The SAME positions are perturbed in every replica, so a
  near-dup pair inside replica i stays a near-dup (both members get the
  same insertions), while a doc and its copy in another replica share
  only the ~50% of 3-shingles that avoid an inserted token — Jaccard
  ~0.33, below the 0.7 threshold.
- embeddings.embedding: circular shift by i components — a rotation, so
  intra-replica geometry (cosines, norms) is EXACT, while cross-replica
  cosine decorrelates. PLUS 5 planted near-duplicates (deterministic
  hash-seeded jitter, cosine ~0.97) of each ANN query vector
  (vec_id < 20): with R replicas the max over ~R*2000 cross-replica
  noise cosines grows like sqrt(2 ln n)/8 (~0.49 at 80k) and eventually
  beats the weakest query's best REAL neighbor (~0.36), which turned
  q56's recall-floor gate into a property of the noise tail instead of
  the index; the planted neighbors dominate every query's exact top-5
  at any replica count, so the gate measures the index again. Jitter is
  pure SQL over hash(), so the generation is oracle-replayable.
- events.ts: shifted by i*400 days, so the hour-partitioned user graph
  is 10 disjoint copies of the original.

Usage: gen_scale.py <srcSfDir> <outDir> [replicas=10] [--events-only]

--events-only writes just events.parquet — the input of the user
interaction graph (~100k edges per sf0.1 replica), so replicas=40 yields
a ~4M-edge graph: above PathFinder's 2M-edge local-kernel gate, forcing
the distributed branch by SIZE rather than by env override.
"""
import sys, os
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = {a for a in sys.argv[1:] if a.startswith("--")}
src, out = args[0], args[1]
R = int(args[2]) if len(args) > 2 else 10
events_only = "--events-only" in flags
OFF = 10_000_000
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql(f"CREATE TABLE reps AS SELECT unnest(range({R})) AS i")

def gen(table, sql):
    con.sql(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")

# dims shared across replicas
for t in (["region", "nation"] if not events_only else []):
    gen(t, f"SELECT * FROM '{src}/{t}.parquet'")

if events_only:
    def gen(table, sql):  # relational tables skipped in events-only mode
        pass

gen("customer", f"""
  SELECT c_custkey + i*{OFF} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{src}/customer.parquet', reps""")
gen("supplier", f"""
  SELECT s_suppkey + i*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{src}/supplier.parquet', reps""")
gen("part", f"""
  SELECT p_partkey + i*{OFF} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM '{src}/part.parquet', reps""")
gen("orders", f"""
  SELECT o_orderkey + i*{OFF} AS o_orderkey, o_custkey + i*{OFF} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', reps""")
gen("lineitem", f"""
  SELECT l_orderkey + i*{OFF} AS l_orderkey, l_partkey + i*{OFF} AS l_partkey,
         l_suppkey + i*{OFF} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{src}/lineitem.parquet', reps""")

# documents: word-position-deterministic insertion (see module doc)
gen("documents", f"""
  SELECT doc_id + i*{OFF} AS doc_id,
         CASE WHEN i = 0 OR text IS NULL THEN text
              ELSE array_to_string(
                flatten(list_transform(string_split(text, ' '),
                  (w, j) -> CASE WHEN j % 5 = 0
                                 THEN ['q' || i || 'z' || (j // 5), w]
                                 ELSE [w] END)), ' ')
         END AS text,
         lang, source,
         CASE WHEN i = 0 OR text IS NULL THEN n_chars
              ELSE length(array_to_string(
                flatten(list_transform(string_split(text, ' '),
                  (w, j) -> CASE WHEN j % 5 = 0
                                 THEN ['q' || i || 'z' || (j // 5), w]
                                 ELSE [w] END)), ' '))
         END AS n_chars
  FROM '{src}/documents.parquet', reps""")

# Planted ids live at 9_000_000 + vec_id*10 + cj; rotated replica ids at
# vec_id + i*OFF. Disjointness relies on max(src vec_id)*10 staying under
# OFF and the planted band staying below OFF — assert both instead of
# assuming the base corpus stays small.
_max_vec = con.sql(
    f"SELECT max(vec_id) FROM '{src}/embeddings.parquet'").fetchone()[0]
assert 9_000_000 + _max_vec * 10 + 5 < OFF and _max_vec < 9_000_000 // 10, (
    f"planted vec_id scheme collides: max base vec_id {_max_vec} too "
    f"large for the 9M+id*10+cj band / {OFF} replica offset")

gen("embeddings", f"""
  WITH rot AS (
    SELECT vec_id + i*{OFF} AS vec_id,
           (embedding[(i % len(embedding)) + 1:] ||
            embedding[:(i % len(embedding))])::FLOAT[] AS embedding,
           label
    FROM '{src}/embeddings.parquet', reps),
  anchors AS (
    SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet'
    WHERE vec_id < 20),
  copies AS (SELECT unnest(range(1, 6)) AS cj),
  planted AS (
    SELECT 9000000 + a.vec_id * 10 + c.cj AS vec_id,
           list_transform(a.embedding, (x, j) ->
             (x + 0.05 * ((hash(a.vec_id * 1000003 + c.cj * 8191 + j)
                % 1000) / 500.0 - 1.0))::FLOAT)::FLOAT[] AS embedding,
           a.label
    FROM anchors a, copies c)
  SELECT * FROM rot UNION ALL SELECT * FROM planted""")

# events via pyarrow: DuckDB's parquet writer downgrades TIMESTAMP_NS to
# us, but the engine contract reads ts as NANOS (nanosAsLong)
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

t = pq.read_table(f"{src}/events.parquet")
DAY_NS = 86_400_000_000_000
# normalize to ns BEFORE the int64 shift: a raw .cast(int64) on a
# timestamp[us] column yields MICROsecond integers, and re-casting that
# number as timestamp[ns] compressed every replica's 30-day span into
# 43 minutes (1000x event density — q101's incident windows caught 40k
# events each and the "10x slope" was really a density cliff)
ts_ns = (t["ts"] if pa.types.is_int64(t["ts"].type)
         else t["ts"].cast(pa.timestamp("ns"))).cast(pa.int64())
parts = []
for i in range(R):
    parts.append(pa.table({
        "event_id": pc.add(t["event_id"], i * OFF),
        "ts": pc.add(ts_ns, i * 400 * DAY_NS).cast(pa.timestamp("ns")),
        "user_id": pc.add(t["user_id"], i * OFF),
        "event_type": t["event_type"],
        "value": t["value"],
        "props": t["props"],
    }))
pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
print(f"events: {sum(p.num_rows for p in parts)}")
