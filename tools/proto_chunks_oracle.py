#!/usr/bin/env python3
"""Prototype: DuckDB rebuild of q_pipe_chunks (the T8 priority chunker) vs
the Spark dump. Feasible because the corpus is pure lowercase words (no
[,;], no digits): comma breaks never occur, sentence breaks fire at every
8-word ". Cap" boundary, and break positions come from scanning the
SQL-rebuilt section content directly.
"""
import sys
import duckdb
from proto_fixture_oracle import PAGES_SQL
from proto_sections_oracle import sections_sql

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
VOUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"


def est_b(s):
    return (f"CASE WHEN length({s}) = 0 THEN 0 ELSE "
            f"CAST(TRUNC(list_sum(list_transform(regexp_extract_all({s}, '\\b\\w+\\b|[^\\w\\s]'), "
            f"w -> CASE WHEN length(w) <= 3 THEN 1.0 WHEN length(w) <= 7 THEN 1.3 "
            f"ELSE length(w) / 4.5 END)) * 0.7 + length({s}) / 4.0 * 0.3) AS INTEGER) END")


# One scan of content c collecting typed break points (0-based positions,
# matching the Scala regex match positions); i is the 1-based SQL index.
BREAKS = """
list_filter(list_transform(range(1, length(c) + 1), i ->
  CASE
    WHEN substr(c, i, 1) = chr(10) AND
         (substr(c, i + 1, 3) = '## ' OR substr(c, i + 1, 3) = '###')
      THEN {'p': i - 1, 'prio': 1}
    WHEN substr(c, i, 2) = chr(10) || chr(10) AND
         (i = 1 OR substr(c, i - 1, 1) <> chr(10))
      THEN {'p': i - 1, 'prio': 2}
    WHEN substr(c, i, 1) = chr(10) AND substr(c, i + 1, 2) = '- '
      THEN {'p': i - 1, 'prio': 3}
    WHEN substr(c, i, 1) = '.' AND substr(c, i + 1, 1) = ' ' AND
         substr(c, i + 2, 1) BETWEEN 'A' AND 'Z'
      THEN {'p': i, 'prio': 4}
    ELSE NULL END),
  x -> x IS NOT NULL)
"""

# zone starts ('<!--' tag opens) for the no-candidate fallback
ZONES = """
list_filter(list_transform(range(1, length(c) + 1), i ->
  CASE WHEN substr(c, i, 4) = '<!--' THEN i - 1 ELSE NULL END),
  x -> x IS NOT NULL)
"""

# best cut after pos: min over candidates of key = prio*10^10 + dist*10^5 + p
# (ties break exactly like Scala's minBy-on-first: smallest p last);
# fallback: first zone start in window, else window max.
NEXT_CUT = """
CASE WHEN len(cand_keys) > 0 THEN CAST(list_min(cand_keys) % 100000 AS BIGINT)
     WHEN len(zone_cands) > 0 THEN CAST(list_min(zone_cands) AS BIGINT)
     ELSE least(pos + 3200, length(c)) END
"""

ORACLE = f"""
WITH RECURSIVE fx AS ({PAGES_SQL}),
fx_body AS (SELECT doc_id, p, content FROM fx),
{sections_sql()},
secs AS (
  SELECT doc_id, i AS section_number, fs[i].c AS c,
    {est_b("fs[i].c")} AS total_tok
  FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)
),
single AS (
  SELECT doc_id, section_number, 1 AS chunk_number,
    total_tok AS chunk_token_count, length(c) AS n_chars
  FROM secs WHERE total_tok <= 750
),
multi0 AS (
  SELECT doc_id, section_number, c, {BREAKS} AS bks0, {ZONES} AS zs
  FROM secs WHERE total_tok > 750
),
multi AS (
  -- paragraph-vs-heading dedup: drop prio-2 breaks within 10 of a prio-1
  SELECT doc_id, section_number, c,
    list_filter(bks0, b -> b.prio <> 2 OR
      len(list_filter(bks0, h -> h.prio = 1 AND abs(h.p - b.p) < 10)) = 0)
      AS bks,
    zs
  FROM multi0
),
g AS (
  SELECT doc_id, section_number, c, bks, zs,
    CAST(0 AS BIGINT) AS pos, 0 AS chunk_no, FALSE AS done
  FROM multi
  UNION ALL
  SELECT doc_id, section_number, c, bks, zs,
    CASE WHEN rem <= 750 THEN CAST(length(c) AS BIGINT) ELSE nxt END AS pos,
    chunk_no + 1 AS chunk_no,
    rem <= 750 AS done
  FROM (
    SELECT doc_id, section_number, c, bks, zs, pos, chunk_no, rem,
      {NEXT_CUT} AS nxt
    FROM (
      SELECT doc_id, section_number, c, bks, zs, pos, chunk_no,
        {est_b("substr(c, CAST(pos AS BIGINT) + 1)")} AS rem,
        list_transform(
          list_filter(bks, b -> b.p >= pos + 2000
            AND b.p <= least(pos + 3200, length(c)) AND b.p > pos),
          b -> b.prio * 10000000000 + abs(b.p - (pos + 2500)) * 100000 + b.p)
          AS cand_keys,
        list_filter(zs, z -> z >= pos + 2000
          AND z <= least(pos + 3200, length(c)) AND z > pos) AS zone_cands
      FROM g WHERE NOT done AND pos < length(c)
    )
  )
),
chunks AS (
  SELECT a.doc_id, a.section_number, a.chunk_no AS chunk_number,
    substr(a.c, CAST(b.pos AS BIGINT) + 1, CAST(a.pos - b.pos AS BIGINT)) AS chunk
  FROM g a JOIN g b
    ON a.doc_id = b.doc_id AND a.section_number = b.section_number
   AND a.chunk_no = b.chunk_no + 1
),
multirows AS (
  SELECT doc_id, section_number, chunk_number,
    {est_b("chunk")} AS chunk_token_count, length(chunk) AS n_chars
  FROM chunks
),
allrows AS (
  SELECT * FROM single UNION ALL SELECT * FROM multirows
)
SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,
  CAST(doc_id AS INTEGER) AS chapter_number,
  CAST(section_number AS INTEGER) AS section_number,
  CAST(chunk_number AS INTEGER) AS chunk_number,
  CAST(chunk_token_count AS INTEGER) AS chunk_token_count,
  CAST(n_chars AS INTEGER) AS n_chars
FROM allrows
ORDER BY document_id, chapter_number, section_number, chunk_number
"""


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SFDIR}/documents.parquet')")
    import time
    t0 = time.time()
    o = con.execute(ORACLE).fetchall()
    ocols = [d[0] for d in con.description]
    print(f"oracle: {len(o)} rows in {time.time()-t0:.1f}s")
    s = con.execute(
        f"SELECT * FROM read_parquet('{VOUT}/q_pipe_chunks/*.parquet') "
        "ORDER BY document_id, chapter_number, section_number, chunk_number").fetchall()
    scols = [d[0] for d in con.description]
    print("cols equal:", ocols == scols)
    bad = 0
    sd = {r[:4]: r for r in s}
    od = {r[:4]: r for r in o}
    for k in sorted(set(sd) | set(od)):
        a, b = od.get(k), sd.get(k)
        if a != b:
            bad += 1
            if bad <= 6:
                print("o:", a)
                print("s:", b)
    print(f"spark rows: {len(s)}, mismatched keys: {bad}")
    sys.exit(1 if bad or len(o) != len(s) else 0)


if __name__ == "__main__":
    main()
