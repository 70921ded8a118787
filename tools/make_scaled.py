#!/usr/bin/env python3
"""Scale-rehearsal corpus generator (driver-side tooling, not engine code).

Builds an N-times replica of an sf directory's documents/embeddings
tables for measuring operator growth curves (SCALING.md). Each copy is
an ISOMETRIC transform of the original so the corpus's internal
duplicate/similarity structure replicates exactly per copy while
cross-copy similarity stays at noise level — structure grows linearly,
the way a real 10x corpus does, instead of creating artificial
10-cliques of near-duplicates:

- documents: per-copy vocabulary rotation (a bijection over the global
  word list). Word n-grams (n>=3) map bijectively within a copy, so
  every within-copy Jaccard/MinHash/SimHash relation equals sf0.1's;
  rotated n-grams are distinct across copies, so gram document
  frequency — the Sigma df^2 envelope — grows linearly.
- embeddings: per-copy circular shift of the 64 dims (orthogonal map:
  norms, dot products, and cosine structure preserved within a copy;
  shifted vs unshifted vectors decorrelate across copies).

Copy 0 is the identity — the source sf is a subset of the output.

Usage: python3 tools/make_scaled.py <srcSfDir> <outDir> [copies=10]

Creates outDir and symlinks the non-scaled tables (region..events)
from the source so graft.Bench's table warm-up can run against the
replica directly.
"""
import os
import sys

import duckdb

src, out = sys.argv[1], sys.argv[2]
os.makedirs(out, exist_ok=True)
for t in ['region', 'nation', 'customer', 'supplier', 'part',
          'orders', 'lineitem', 'events']:
    dst = f'{out}/{t}.parquet'
    # lexists + re-link: exists() is False for a dangling symlink
    # (symlink() would then raise) and True for a stale one pointing
    # at a previous source dir (the replica would silently mix scale
    # factors) -- always refresh the link.
    if os.path.islink(dst):
        os.unlink(dst)
    if not os.path.lexists(dst):
        os.symlink(os.path.abspath(f'{src}/{t}.parquet'), dst)
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ID_STRIDE = 10_000_000

con = duckdb.connect()
con.execute(f"CREATE VIEW docs AS SELECT * FROM '{src}/documents.parquet'")
con.execute(f"CREATE VIEW embs AS SELECT * FROM '{src}/embeddings.parquet'")

vocab = [r[0] for r in con.execute(
    "SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM docs "
    "WHERE text IS NOT NULL ORDER BY w").fetchall() if r[0]]
V = len(vocab)
print(f"vocab={V} copies={copies}")

# per-copy rotation offsets: floor(c*V/copies) is strictly increasing
# in c (steps of V/copies >= 1 when copies <= V), so offsets are
# provably distinct in [0, V) with offset(0) = 0 -- the previous
# (c*(V//copies)+c) % V form could collide back to 0 for unlucky
# (V, copies) pairs (e.g. V=12, copies=8 at c=6), silently creating
# verbatim cross-copy replicas and the artificial duplicate cliques
# this tool exists to avoid.
assert copies <= min(V, 64), f"need copies <= min(vocab, 64 dims), got {copies}"
def offset(c):
    return (c * V) // copies

idx = {w: i for i, w in enumerate(vocab)}
rows = con.execute(
    "SELECT doc_id, text, lang, source FROM docs ORDER BY doc_id").fetchall()

out_rows = []
for c in range(copies):
    o = offset(c)
    mapping = {w: vocab[(i + o) % V] for w, i in idx.items()}
    for doc_id, text, lang, source in rows:
        t = text if (c == 0 or text is None) else \
            " ".join(mapping.get(w, w) for w in text.split(" "))
        out_rows.append((doc_id + c * ID_STRIDE, t, lang, source,
                         None if t is None else len(t)))

con.execute("""CREATE TABLE docs_out (doc_id BIGINT, text VARCHAR,
  lang VARCHAR, source VARCHAR, n_chars BIGINT)""")
con.executemany("INSERT INTO docs_out VALUES (?,?,?,?,?)", out_rows)
con.execute(f"""
  COPY (SELECT * FROM docs_out ORDER BY doc_id)
  TO '{out}/documents.parquet' (FORMAT PARQUET)""")

emb_parts = []
for c in range(copies):
    shift = (c * 64) // copies  # distinct for copies <= 64, same argument
    emb_parts.append(f"""
      SELECT vec_id + {c * ID_STRIDE} AS vec_id,
             embedding[{shift + 1}:64] || embedding[1:{shift}] AS embedding,
             label
      FROM embs""")
con.execute(f"""
  COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label
        FROM ({' UNION ALL '.join(emb_parts)}) ORDER BY vec_id)
  TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

for t in ("documents", "embeddings"):
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
