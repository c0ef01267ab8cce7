#!/usr/bin/env python3
"""Prototype: DuckDB SQL rebuild of FixtureCorpus.pages vs a faithful python
port of the Scala. 3-way check later adds the Spark dump (graft.Verify).

Usage: python3 tools/proto_fixture_oracle.py [sfDir]
"""
import sys
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


# --- faithful python port of FixtureCorpus.pages (graft/text/FixtureCorpus.scala)
def fixture_pages(doc_id, text):
    words = [w for w in (text or "").split() if w]
    safe = words if words else ["empty"]
    n_pages = 2 + doc_id % 4
    wpp = 700 if doc_id % 7 == 0 else 60 + (doc_id % 5) * 30

    def word(i):
        return safe[((i % len(safe)) + len(safe)) % len(safe)]

    out = []
    for p in range(1, n_pages + 1):
        sb = []
        hl = 1 + (doc_id + p) % 3
        sb.append("#" * hl + f" Part {p} of doc {doc_id}\n\n")
        w = doc_id * 131 + p * 17
        emitted = 0
        sl = 0
        while emitted < wpp:
            sb.append(word(w))
            w += 1
            emitted += 1
            sl += 1
            if sl >= 8:
                sb.append(". ")
                cw = word(w)
                sb.append(cw[:1].upper() + cw[1:])  # Scala capitalize
                w += 1
                emitted += 1
                sl = 1
            else:
                sb.append(" ")
            if emitted % 40 == 0:
                sb.append("\n\n")
        sb.append(".\n")
        if p % 2 == 0:
            sb.append("\n")
            for k in range(1, 4):
                sb.append(f"- {word(w + k)} item {k}\n")
        out.append((p, "".join(sb)))
    return out


# --- DuckDB SQL rebuild (closed form: the %40 branch is dead code — after-
# iteration `emitted` values skip all multiples of 8, hence 40 never hits)
def wd(i):  # word at absolute index i (1-based list)
    return f"safe[CAST(({i}) % nw AS BIGINT) + 1]"


CAP = (f"upper(substr({wd('w0 + k - 1')}, 1, 1)) || "
       f"substr({wd('w0 + k - 1')}, 2)")

PAGES_SQL = f"""
WITH fx_doc AS (
  SELECT doc_id,
    list_filter(string_split_regex(COALESCE(text, ''), '\\s+'), w -> w <> '') AS ws
  FROM documents
), fx_docw AS (
  SELECT doc_id,
    CASE WHEN len(ws) = 0 THEN ['empty'] ELSE ws END AS safe,
    CAST(2 + (doc_id % 4) AS BIGINT) AS np,
    CASE WHEN doc_id % 7 = 0 THEN 700 ELSE 60 + (doc_id % 5) * 30 END AS total
  FROM fx_doc
), fx_pg AS (
  SELECT doc_id, safe, len(safe) AS nw, total, CAST(p AS INTEGER) AS p,
    doc_id * 131 + p * 17 AS w0,
    total + CASE WHEN total % 8 = 0 THEN 1 ELSE 0 END AS e
  FROM fx_docw, UNNEST(generate_series(1, np)) AS t(p)
), fx_body AS (
  SELECT doc_id, p, safe, nw, w0, e,
    repeat('#', CAST(1 + (doc_id + p) % 3 AS BIGINT))
      || ' Part ' || p || ' of doc ' || doc_id || chr(10) || chr(10)
      || array_to_string(list_transform(generate_series(1, e), k ->
           (CASE WHEN k > 1 AND k % 8 = 1 THEN {CAP} ELSE {wd('w0 + k - 1')} END)
           || (CASE WHEN k = e THEN (CASE WHEN k > 1 AND k % 8 = 1 THEN '' ELSE ' ' END)
               WHEN k % 8 = 0 THEN '. '
               WHEN k > 1 AND k % 8 = 1 THEN ''
               ELSE ' ' END)), '')
      || '.' || chr(10)
      || CASE WHEN p % 2 = 0 THEN chr(10)
           || '- ' || {wd('w0 + e + 1')} || ' item 1' || chr(10)
           || '- ' || {wd('w0 + e + 2')} || ' item 2' || chr(10)
           || '- ' || {wd('w0 + e + 3')} || ' item 3' || chr(10)
         ELSE '' END AS content
  FROM fx_pg
)
SELECT doc_id, p, content FROM fx_body ORDER BY doc_id, p
"""


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SFDIR}/documents.parquet')")
    rows = con.execute(PAGES_SQL).fetchall()
    docs = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    exp = {}
    for d, t in docs.items():
        for p, c in fixture_pages(d, t):
            exp[(d, p)] = c
    bad = 0
    if {k for k in exp} != {(d, p) for d, p, _ in rows}:
        print("KEYSET MISMATCH")
        bad += 1
    for d, p, c in rows:
        e = exp.get((d, p))
        if c != e:
            bad += 1
            if bad <= 3:
                print(f"MISMATCH doc={d} p={p}")
                print("  sql:", repr(c[:200]))
                print("  py :", repr((e or "")[:200]))
                # find first diff
                if e:
                    for i, (a, b) in enumerate(zip(c, e)):
                        if a != b:
                            print(f"  first diff @{i}: sql={c[i-20:i+20]!r} py={e[i-20:i+20]!r}")
                            break
    print(f"checked {len(rows)} pages, mismatches: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
