#!/usr/bin/env python3
"""Prototype: DuckDB rebuild of q_pipe_sections (hierarchical split +
mergeSmall over the fixture corpus) vs the Spark dump in /tmp/vout.

Structure facts (verified against the Scala in graft.text):
- PageTags.embed: hdr + \n + trim(page) + \n + ftr + \n per page
- heading levels cycle 1+(d+p)%3 -> no section ever spans >3 pages ->
  recursiveSplit never deepens; every section is level 1, splittingLevel 1
- first H1 page q = [3,2,1][d%3]; H1 pages {q, q+3} ∩ [1, np]
- pre-merge sections: optional intro (pages 1..q-1 + hdr(q) tail), H1
  section(s), each a contiguous page range sliced at header-tag pullbacks
- mergeSmall over <=3 all-level-1 sections enumerates to 4 outcomes
"""
import sys
import duckdb
from proto_fixture_oracle import PAGES_SQL

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
VOUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"


def est(c):  # Tokens.estimateA over a content expression
    return (f"GREATEST(length({c}) // 10, "
            f"LEAST(CAST(TRUNC(length({c}) / 3.5) AS BIGINT), length({c}) // 2))")


def sec(title, c, sp, ep):
    return (f"{{'title': {title}, 'c': {c}, 'sp': CAST({sp} AS BIGINT), "
            f"'ep': CAST({ep} AS BIGINT), 'tk': {est(c)}}}")


def merge2(i, j):  # merge adjacent runs keeping first's title
    return ("{'title': s[" + str(i) + "].title, "
            "'c': s[" + str(i) + "].c || chr(10) || s[" + str(j) + "].c, "
            "'sp': least(s[" + str(i) + "].sp, s[" + str(j) + "].sp), "
            "'ep': greatest(s[" + str(i) + "].ep, s[" + str(j) + "].ep), "
            "'tk': s[" + str(i) + "].tk + s[" + str(j) + "].tk}")


MERGE3 = ("{'title': s[1].title, "
          "'c': s[1].c || chr(10) || s[2].c || chr(10) || s[3].c, "
          "'sp': least(s[1].sp, s[2].sp, s[3].sp), "
          "'ep': greatest(s[1].ep, s[2].ep, s[3].ep), "
          "'tk': s[1].tk + s[2].tk + s[3].tk}")


def sections_sql():
    intro_c = ("COALESCE(array_to_string(tl[1:CAST(q AS BIGINT)-1], ''), '')"
               " || hl[CAST(q AS BIGINT)]")
    s1_c = ("rtrim(array_to_string(tl[CAST(q AS BIGINT):CAST(CASE WHEN q+3 <= np "
            "THEN q+2 ELSE np END AS BIGINT)], ''), chr(10))")
    s2_c = "rtrim(array_to_string(tl[CAST(q+3 AS BIGINT):CAST(np AS BIGINT)], ''), chr(10))"
    full_c = "array_to_string(tl, '')"
    chap_title = "'Chapter ' || CAST(doc_id AS VARCHAR)"
    p1_title = "'Part ' || CAST(q AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR)"
    p2_title = "'Part ' || CAST(q+3 AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR)"
    return f"""
fx_tag AS (
  SELECT doc_id, p,
    '<!-- PageHeader PageNumber="' || p || '" PageReference="' || doc_id || '-' || p || '" -->' AS hdr,
    '<!-- PageFooter PageNumber="' || p || '" PageReference="' || doc_id || '-' || p || '" -->' AS ftr,
    rtrim(content, chr(10)) AS cln
  FROM fx_body
), fx_chap AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 2 ELSE 1 END AS q,
    2 + doc_id % 4 AS np,
    list(hdr || chr(10) || cln || chr(10) || ftr || chr(10) ORDER BY p) AS tl,
    list(hdr ORDER BY p) AS hl
  FROM fx_tag GROUP BY doc_id
), fx_secs AS (
  SELECT doc_id, q, np,
    CASE WHEN q > np THEN [{sec(chap_title, full_c, 1, 'np')}]
    ELSE
      [{sec(chap_title, intro_c, 1, 'q')}]
      || [{sec(p1_title, s1_c, 'q', 'CASE WHEN q+3 <= np THEN q+2 ELSE np END')}]
      || (CASE WHEN q+3 <= np THEN [{sec(p2_title, s2_c, 'q+3', 'np')}] ELSE [] END)
    END AS s
  FROM fx_chap
), fx_merged AS (
  SELECT doc_id,
    CASE len(s)
    WHEN 1 THEN s
    WHEN 2 THEN
      CASE WHEN (s[1].tk < 250 OR s[2].tk < 250) AND s[1].tk + s[2].tk <= 750
      THEN [{merge2(1, 2)}]
      ELSE s END
    ELSE
      CASE
      WHEN (s[1].tk < 250 OR s[2].tk < 250) AND s[1].tk + s[2].tk <= 750 THEN
        CASE WHEN s[3].tk < 250 AND s[1].tk + s[2].tk + s[3].tk <= 750
        THEN [{MERGE3}]
        ELSE [{merge2(1, 2)}, s[3]] END
      WHEN (s[2].tk < 250 OR s[3].tk < 250) AND s[2].tk + s[3].tk <= 750
      THEN [s[1], {merge2(2, 3)}]
      ELSE s END
    END AS fs
  FROM fx_secs
)"""


ORACLE = f"""
WITH fx AS ({PAGES_SQL}),
fx_body AS (SELECT doc_id, p, content FROM fx),
{sections_sql()}
SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,
  CAST(doc_id AS INTEGER) AS chapter_number,
  CAST(i AS INTEGER) AS section_number,
  fs[i].title AS section_title,
  1 AS section_level, 1 AS splitting_level,
  fs[i].title AS section_hierarchy,
  CAST(fs[i].sp AS INTEGER) AS section_start_page,
  CAST(fs[i].ep AS INTEGER) AS section_end_page,
  CAST(fs[i].ep - fs[i].sp + 1 AS INTEGER) AS section_page_count,
  CAST(fs[i].tk AS INTEGER) AS section_token_count,
  CAST(length(fs[i].c) AS INTEGER) AS n_chars
FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)
ORDER BY chapter_number, section_number
"""


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SFDIR}/documents.parquet')")
    o = con.execute(ORACLE).fetchall()
    ocols = [d[0] for d in con.description]
    s = con.execute(
        f"SELECT * FROM read_parquet('{VOUT}/q_pipe_sections/*.parquet') "
        "ORDER BY chapter_number, section_number").fetchall()
    scols = [d[0] for d in con.description]
    print("cols equal:", ocols == scols, ocols if ocols != scols else "")
    print("oracle rows:", len(o), "spark rows:", len(s))
    bad = 0
    for a, b in zip(o, s):
        if a != b:
            bad += 1
            if bad <= 5:
                print("o:", a)
                print("s:", b)
    print("row mismatches:", bad)
    sys.exit(1 if bad or len(o) != len(s) else 0)


if __name__ == "__main__":
    main()
