#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet (Spark output from graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by value, and compares exactly.
This is NOT the driver's code — it is a best-effort reimplementation of the
documented compare (column-name sort + value hash) so mismatches surface
before the driver runs.
"""
import sys, json, glob, math, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical value for compare: floats via repr (exact), others via str."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_rows(rel):
    """rel: a DuckDBPyRelation (con.sql(...)). Returns (sorted cols, rows, types).

    Uses relation .columns/.types, NOT the DBAPI cursor description — the
    DBAPI reports every numeric as generic NUMBER, which is why the old
    HUGEINT lint could never fire (r5 escape: 3 hash mismatches shipped).
    """
    cols = list(rel.columns)
    types = {c: str(t) for c, t in zip(cols, rel.types)}
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return [cols[i] for i in order], sorted(rows), types


def wide_cols(o_types, s_types):
    """Oracle columns whose DuckDB type serializes differently from Spark's.

    HUGEINT/UHUGEINT always differ (Spark has no int128). DECIMAL only
    differs when the Spark column is NOT itself decimal — a decimal-vs-
    decimal compare is fine (q_sim_pagerank relies on it)."""
    out = []
    for c, t in o_types.items():
        if "HUGEINT" in t:
            out.append(f"{c}:{t}")
        elif "DECIMAL" in t and "DECIMAL" not in s_types.get(c, "DECIMAL"):
            out.append(f"{c}:{t} vs spark {s_types.get(c)}")
    return out


def selftest():
    """Prove the wide-type lint can actually fire (the r5 escape was a
    lint that could never fire): an uncast integer SUM must be flagged,
    the cast forms and decimal-vs-decimal must not."""
    con = duckdb.connect()
    def types_of(q):
        rel = con.sql(q)
        return {c: str(t) for c, t in zip(rel.columns, rel.types)}
    bad = types_of("SELECT SUM(x) AS s FROM (VALUES (1),(2)) t(x)")
    ok = types_of("SELECT CAST(SUM(x) AS BIGINT) AS s, COUNT(*) AS c "
                  "FROM (VALUES (1),(2)) t(x)")
    dec = types_of("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
    assert wide_cols(bad, {"s": "BIGINT"}) == ["s:HUGEINT"], \
        f"uncast SUM not flagged: {wide_cols(bad, {'s': 'BIGINT'})}"
    assert wide_cols(ok, {"s": "BIGINT", "c": "BIGINT"}) == []
    assert wide_cols(dec, {"d": "DOUBLE"}), "DECIMAL-vs-double not flagged"
    assert wide_cols(dec, {"d": "DECIMAL(10,2)"}) == [], \
        "DECIMAL-vs-decimal wrongly flagged"
    print("selftest OK: uncast SUM flags, casts pass, decimal rules hold")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    secs = {}  # per-oracle compare wall-clock -> <outdir>/oracle_secs.json
    spark_dirs = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{outdir}/*/")}

    def compare_one(name):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            return "NO_SPARK_OUTPUT"
        s_cols, s_rows, s_types = table_rows(con.sql(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])"))
        if name not in oracle:
            return f"ROWS_ONLY rows={len(s_rows)}" + (
                "" if len(s_rows) > 0 else " EMPTY!")
        try:
            # Lint: HUGEINT (and DECIMAL-vs-nondecimal) oracle outputs
            # serialize differently from Spark's int64/double in the driver
            # even when python ints match here.
            o_cols, o_rows, o_types = table_rows(con.sql(oracle[name]))
            wide = wide_cols(o_types, s_types)
        except Exception as e:
            return f"ORACLE_SQL_ERROR: {e}"
        if wide:
            return f"WIDE_TYPE_RISK cols={wide} (CAST to BIGINT/DOUBLE)"
        if s_cols != o_cols:
            return f"SCHEMA_MISMATCH spark={s_cols} oracle={o_cols}"
        if s_rows != o_rows:
            diff = next((i, a, b) for i, (a, b)
                        in enumerate(zip(s_rows + [None] * len(o_rows),
                                         o_rows + [None] * len(s_rows)))
                        if a != b)
            return (f"ROW_MISMATCH n_spark={len(s_rows)} "
                    f"n_oracle={len(o_rows)} first_diff@{diff[0]}: "
                    f"spark={diff[1]} oracle={diff[2]}")
        return f"MATCH rows={len(s_rows)}"

    for name in sorted(spark_dirs):
        t0 = time.time()
        results[name] = compare_one(name)
        secs[name] = round(time.time() - t0, 3)
    missing = set(oracle) - spark_dirs
    for name in missing:
        results[name] = "NO_SPARK_OUTPUT_FOR_ORACLE"
    # Gate-cost forensics: per-oracle compare seconds, so a mirror that
    # outgrows the ~30s single-oracle budget (see COVERAGE.md gate-cost
    # note) is visible the round it happens, not when the driver's
    # whole-gate wall-clock blows. Heaviest-first on stderr for a quick
    # read; full map in oracle_secs.json next to the dumps.
    with open(f"{outdir}/oracle_secs.json", "w") as f:
        json.dump(secs, f, sort_keys=True)
    # Comparator-environment forensics (r10 VERDICT #5: the driver
    # hash-FAILed q_corpus_distinct_hll while this mirror MATCHed at both
    # SFs, and nothing recorded which duckdb/python the two verdicts ran
    # on). One file per gate run, next to oracle_secs.json.
    with open(f"{outdir}/verify_env.json", "w") as f:
        json.dump({
            "duckdb_version": duckdb.__version__,
            "python_version": sys.version,
            "canonicalization": {
                "floats": "repr(x); NaN -> 'NaN'",
                "null": "'NULL'", "bytes": "hex",
                "other": "str(x)",
                "rows": "sorted tuples of canon values",
                "cols": "sorted by name",
            },
            "compared": sorted(spark_dirs),
            "sf_dir": sfdir,
        }, f, indent=2, sort_keys=True)
    worst = sorted(secs.items(), key=lambda kv: -kv[1])[:8]
    print("[time] slowest compares: " +
          ", ".join(f"{n}={s}s" for n, s in worst), file=sys.stderr)
    over = {n: s for n, s in secs.items() if s > 30}
    if over:
        print(f"[time] OVER-BUDGET (>30s single oracle): {over}",
              file=sys.stderr)
    ok = True
    for name in sorted(results):
        status = results[name]
        flag = "OK " if status.startswith(("MATCH", "ROWS_ONLY rows=")) \
            and "EMPTY" not in status else "FAIL"
        if flag == "FAIL":
            ok = False
        print(f"[{flag}] {name}: {status}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
