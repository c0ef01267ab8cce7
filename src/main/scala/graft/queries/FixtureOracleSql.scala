package graft.queries

/** DuckDB mirrors for the FixtureCorpus → pages → sections → summaries
  * pipeline — the SQL rebuild that turned the pipe/enrich family from
  * rows-only into exact hash-checked oracles.
  *
  * Why this is possible: every page is a pure function of (doc_id, text)
  * (FixtureCorpus), and on this corpus the section machinery collapses to
  * closed form:
  *
  *  - the page generator's `emitted % 40` paragraph-break branch is DEAD
  *    CODE: after-iteration `emitted` values skip every multiple of 8
  *    (the 8th word of a sentence always triggers the capitalized-word
  *    boundary in the same iteration), and 40 is a multiple of 8 — so a
  *    page body is one heading plus one unbroken sentence run (verified
  *    empirically: the SQL omits the branch, a faithful python port keeps
  *    it, all 1,750 sf0.01 pages md5-match both);
  *  - words are emitted at consecutive indices w0 = d·131 + p·17, with the
  *    word at position e capitalized iff e > 1 ∧ e ≡ 1 (mod 8); the loop
  *    overshoots to E = total+1 words iff total ≡ 0 (mod 8);
  *  - heading levels cycle 1+((d+p) mod 3), so H1 pages recur with period
  *    3 and no section ever spans more than 3 pages → `recursiveSplit`
  *    never deepens, every section is level 1 / splittingLevel 1, and
  *    `PageInference` is a no-op (every section carries page tags);
  *  - the chapter intro section ALWAYS exists — even when page 1 is an H1
  *    the intro captures that page's header tag (the heading position is
  *    after `hdr(1)+"\n"`, and the pulled-back section start is 0, so the
  *    tag lands in both) — pinned to startPage 1, endPage = first H1 page;
  *  - chapters therefore have ≤ 3 pre-merge sections (intro, H1@q,
  *    H1@q+3 with q = [3,2,1][d mod 3]), and `mergeSmall` over ≤ 3
  *    all-level-1 sections enumerates to exactly four outcomes, decided
  *    by estimateA token counts — a finite CASE tree, no recursion;
  *  - `PageCorrection` on this shape assigns each section its true page
  *    range with refs "d-p" and fires no continuity clamp.
  *
  * The q_catalog_page_sections mirror covers the one code path the corpus
  * exercises: documents.text contains no sentence punctuation-plus-space
  * and no newlines (checked at sf0.001/0.01/0.1), so NaturalSections
  * always takes the char-split path, including the reference quirk that
  * the whitespace backtrack shortens section i but section i+1 still
  * starts at the unadjusted i·sectionLen offset (the gap chars vanish).
  * The sentence/paragraph paths stay covered by NaturalSectionsSpec; a
  * corpus change would surface as an oracle mismatch, not silence.
  *
  * Scale note: the chapter-summary mirror recomputes the enricher's
  * FNV-1a 64-bit tag in pure SQL via 32-bit limbs (the FNV prime is
  * 2^40+435, so the high limb's 2^72 product vanishes mod 2^64) — no
  * HUGEINT in the per-char loop. Chapters stay single-segment because
  * estimateA(chapterText) ≪ the 78k-token budget at every fixture scale.
  */
private[queries] object FixtureOracleSql {

  // ---- page rebuild -------------------------------------------------

  /** Word at absolute emission index `i` (1-based SQL list). */
  private def wd(i: String): String = s"safe[CAST(($i) % nw AS BIGINT) + 1]"

  private val cap: String =
    s"upper(substr(${wd("w0 + k - 1")}, 1, 1)) || substr(${wd("w0 + k - 1")}, 2)"

  /** Standalone SELECT: (doc_id, p, content) — the raw synthetic pages. */
  val pagesSelect: String =
    "WITH fx_doc AS (\n" +
      "  SELECT doc_id,\n" +
      "    list_filter(string_split_regex(COALESCE(text, ''), '\\s+'), w -> w <> '') AS ws\n" +
      "  FROM documents\n" +
      "), fx_docw AS (\n" +
      "  SELECT doc_id,\n" +
      "    CASE WHEN len(ws) = 0 THEN ['empty'] ELSE ws END AS safe,\n" +
      "    CAST(2 + (doc_id % 4) AS BIGINT) AS np,\n" +
      "    CASE WHEN doc_id % 7 = 0 THEN 700 ELSE 60 + (doc_id % 5) * 30 END AS total\n" +
      "  FROM fx_doc\n" +
      "), fx_pg AS (\n" +
      "  SELECT doc_id, safe, len(safe) AS nw, total, CAST(p AS INTEGER) AS p,\n" +
      "    doc_id * 131 + p * 17 AS w0,\n" +
      "    total + CASE WHEN total % 8 = 0 THEN 1 ELSE 0 END AS e\n" +
      "  FROM fx_docw, UNNEST(generate_series(1, np)) AS t(p)\n" +
      ")\n" +
      "SELECT doc_id, p,\n" +
      "  repeat('#', CAST(1 + (doc_id + p) % 3 AS BIGINT))\n" +
      "    || ' Part ' || p || ' of doc ' || doc_id || chr(10) || chr(10)\n" +
      "    || array_to_string(list_transform(generate_series(1, e), k ->\n" +
      s"         (CASE WHEN k > 1 AND k % 8 = 1 THEN $cap ELSE ${wd("w0 + k - 1")} END)\n" +
      "         || (CASE WHEN k = e THEN (CASE WHEN k > 1 AND k % 8 = 1 THEN '' ELSE ' ' END)\n" +
      "             WHEN k % 8 = 0 THEN '. '\n" +
      "             WHEN k > 1 AND k % 8 = 1 THEN ''\n" +
      "             ELSE ' ' END)), '')\n" +
      "    || '.' || chr(10)\n" +
      "    || CASE WHEN p % 2 = 0 THEN chr(10)\n" +
      s"         || '- ' || ${wd("w0 + e + 1")} || ' item 1' || chr(10)\n" +
      s"         || '- ' || ${wd("w0 + e + 2")} || ' item 2' || chr(10)\n" +
      s"         || '- ' || ${wd("w0 + e + 3")} || ' item 3' || chr(10)\n" +
      "       ELSE '' END AS content\n" +
      "FROM fx_pg"

  // ---- section structure --------------------------------------------

  /** Tokens.estimateA over a content expression. */
  private def est(c: String): String =
    s"GREATEST(length($c) // 10, LEAST(CAST(TRUNC(length($c) / 3.5) AS BIGINT), length($c) // 2))"

  private def sec(title: String, c: String, sp: String, ep: String): String =
    s"{'title': $title, 'c': $c, 'sp': CAST($sp AS BIGINT), " +
      s"'ep': CAST($ep AS BIGINT), 'tk': ${est(c)}}"

  private def merge2(i: Int, j: Int): String =
    s"{'title': s[$i].title, 'c': s[$i].c || chr(10) || s[$j].c, " +
      s"'sp': least(s[$i].sp, s[$j].sp), 'ep': greatest(s[$i].ep, s[$j].ep), " +
      s"'tk': s[$i].tk + s[$j].tk}"

  private val merge3: String =
    "{'title': s[1].title, " +
      "'c': s[1].c || chr(10) || s[2].c || chr(10) || s[3].c, " +
      "'sp': least(s[1].sp, s[2].sp, s[3].sp), " +
      "'ep': greatest(s[1].ep, s[2].ep, s[3].ep), " +
      "'tk': s[1].tk + s[2].tk + s[3].tk}"

  /** CTE chain `fx_tag, fx_chap, fx_secs, fx_merged` over a prior
    * `fx_body(doc_id, p, content)`: tagged pages → pre-merge sections →
    * merged sections (list column `fs` of {title, c, sp, ep, tk}). */
  val sectionsCtes: String = {
    val introC =
      "COALESCE(array_to_string(tl[1:CAST(q AS BIGINT)-1], ''), '') || hl[CAST(q AS BIGINT)]"
    val s1C =
      "rtrim(array_to_string(tl[CAST(q AS BIGINT):CAST(CASE WHEN q+3 <= np THEN q+2 ELSE np END AS BIGINT)], ''), chr(10))"
    val s2C =
      "rtrim(array_to_string(tl[CAST(q+3 AS BIGINT):CAST(np AS BIGINT)], ''), chr(10))"
    val fullC = "array_to_string(tl, '')"
    val chapTitle = "'Chapter ' || CAST(doc_id AS VARCHAR)"
    val p1Title = "'Part ' || CAST(q AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR)"
    val p2Title = "'Part ' || CAST(q+3 AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR)"
    "fx_tag AS (\n" +
      "  SELECT doc_id, p,\n" +
      "    '<!-- PageHeader PageNumber=\"' || p || '\" PageReference=\"' || doc_id || '-' || p || '\" -->' AS hdr,\n" +
      "    '<!-- PageFooter PageNumber=\"' || p || '\" PageReference=\"' || doc_id || '-' || p || '\" -->' AS ftr,\n" +
      "    rtrim(content, chr(10)) AS cln\n" +
      "  FROM fx_body\n" +
      "), fx_chap AS (\n" +
      "  SELECT doc_id,\n" +
      "    CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 2 ELSE 1 END AS q,\n" +
      "    2 + doc_id % 4 AS np,\n" +
      "    list(hdr || chr(10) || cln || chr(10) || ftr || chr(10) ORDER BY p) AS tl,\n" +
      "    list(hdr ORDER BY p) AS hl\n" +
      "  FROM fx_tag GROUP BY doc_id\n" +
      "), fx_secs AS (\n" +
      "  SELECT doc_id, q, np,\n" +
      s"    CASE WHEN q > np THEN [${sec(chapTitle, fullC, "1", "np")}]\n" +
      "    ELSE\n" +
      s"      [${sec(chapTitle, introC, "1", "q")}]\n" +
      s"      || [${sec(p1Title, s1C, "q", "CASE WHEN q+3 <= np THEN q+2 ELSE np END")}]\n" +
      s"      || (CASE WHEN q+3 <= np THEN [${sec(p2Title, s2C, "q+3", "np")}] ELSE [] END)\n" +
      "    END AS s\n" +
      "  FROM fx_chap\n" +
      "), fx_merged AS (\n" +
      "  SELECT doc_id,\n" +
      "    CASE len(s)\n" +
      "    WHEN 1 THEN s\n" +
      "    WHEN 2 THEN\n" +
      "      CASE WHEN (s[1].tk < 250 OR s[2].tk < 250) AND s[1].tk + s[2].tk <= 750\n" +
      s"      THEN [${merge2(1, 2)}]\n" +
      "      ELSE s END\n" +
      "    ELSE\n" +
      "      CASE\n" +
      "      WHEN (s[1].tk < 250 OR s[2].tk < 250) AND s[1].tk + s[2].tk <= 750 THEN\n" +
      "        CASE WHEN s[3].tk < 250 AND s[1].tk + s[2].tk + s[3].tk <= 750\n" +
      s"        THEN [$merge3]\n" +
      s"        ELSE [${merge2(1, 2)}, s[3]] END\n" +
      "      WHEN (s[2].tk < 250 OR s[3].tk < 250) AND s[2].tk + s[3].tk <= 750\n" +
      s"      THEN [s[1], ${merge2(2, 3)}]\n" +
      "      ELSE s END\n" +
      "    END AS fs\n" +
      "  FROM fx_secs\n" +
      ")"
  }

  /** Shared prefix: rebuilt pages + merged-section list per chapter. */
  private val fxPrefix: String =
    s"WITH fx AS ($pagesSelect),\nfx_body AS (SELECT doc_id, p, content FROM fx),\n$sectionsCtes"

  // ---- enricher primitives ------------------------------------------

  /** FNV-1a 64-bit tag8 over column `ct` — DeterministicEnricher.h64 /
    * tag8 in 32-bit limbs ({h, l} BIGINT struct accumulator; basis limbs
    * 0xcbf29ce4 / 0x84222325; prime 2^40+435 so hi·2^72 ≡ 0 mod 2^64). */
  private val fnvTag8: String =
    "lpad(lower(hex((list_reduce(\n" +
      "  list_prepend({'h': CAST(3421674724 AS BIGINT), 'l': CAST(2216829733 AS BIGINT)},\n" +
      "    list_transform(CASE WHEN length(ct) = 0 THEN [] ELSE string_split(ct, '') END,\n" +
      "      c -> {'h': CAST(0 AS BIGINT), 'l': CAST(unicode(c) AS BIGINT)})),\n" +
      "  (a, x) -> {'h': ((xor(a.l, x.l) * 435) // 4294967296\n" +
      "                 + (a.h * 435) % 4294967296\n" +
      "                 + (xor(a.l, x.l) % 16777216) * 256) % 4294967296,\n" +
      "             'l': (xor(a.l, x.l) * 435) % 4294967296})).h)), 8, '0')"

  /** firstSentences(·, 2) over whitespace-collapsed column `coll` — the
    * lazy two-sentence prefix (RE2 has no lookbehind; same pattern family
    * as the first-3 mirror in EnrichQueries). */
  private val first2: String =
    "CASE WHEN regexp_extract(coll, '^(.*?[.!?] .*?[.!?])(?: |$)', 1) <> '' " +
      "THEN regexp_extract(coll, '^(.*?[.!?] .*?[.!?])(?: |$)', 1) ELSE coll END"

  // ---- the six oracles ----------------------------------------------

  /** q_fixture_pages: full metadata + length + md5 per rebuilt page. */
  val fixturePages: String =
    s"WITH fx AS ($pagesSelect)\n" +
      "SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  CAST(doc_id AS INTEGER) AS chapter_number,\n" +
      "  'Chapter ' || CAST(doc_id AS VARCHAR) AS chapter_name,\n" +
      "  'doc_' || CAST(doc_id AS VARCHAR) || '.pdf' AS filename,\n" +
      "  CAST(p AS INTEGER) AS page_number,\n" +
      "  CAST(doc_id AS VARCHAR) || '-' || CAST(p AS VARCHAR) AS page_reference,\n" +
      "  CAST(doc_id * 10 + p AS INTEGER) AS source_page_number,\n" +
      "  CAST(length(content) AS INTEGER) AS n_chars,\n" +
      "  md5(content) AS fp\n" +
      "FROM fx ORDER BY chapter_number, page_number"

  /** q_pipe_sections: the merged-section inventory, value-exact. */
  val pipeSections: String =
    s"$fxPrefix\n" +
      "SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  CAST(doc_id AS INTEGER) AS chapter_number,\n" +
      "  CAST(i AS INTEGER) AS section_number,\n" +
      "  fs[i].title AS section_title,\n" +
      "  1 AS section_level, 1 AS splitting_level,\n" +
      "  fs[i].title AS section_hierarchy,\n" +
      "  CAST(fs[i].sp AS INTEGER) AS section_start_page,\n" +
      "  CAST(fs[i].ep AS INTEGER) AS section_end_page,\n" +
      "  CAST(fs[i].ep - fs[i].sp + 1 AS INTEGER) AS section_page_count,\n" +
      "  CAST(fs[i].tk AS INTEGER) AS section_token_count,\n" +
      "  CAST(length(fs[i].c) AS INTEGER) AS n_chars\n" +
      "FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)\n" +
      "ORDER BY chapter_number, section_number"

  /** q_pipe_sections_corrected: W5 bounds = true page ranges, refs d-p,
    * no continuity clamp fires on this shape. */
  val pipeSectionsCorrected: String =
    s"$fxPrefix\n" +
      "SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  CAST(doc_id AS INTEGER) AS chapter_number,\n" +
      "  CAST(i AS INTEGER) AS section_number,\n" +
      "  CAST(fs[i].sp AS INTEGER) AS section_start_page,\n" +
      "  CAST(fs[i].ep AS INTEGER) AS section_end_page,\n" +
      "  CAST(fs[i].ep - fs[i].sp + 1 AS INTEGER) AS section_page_count,\n" +
      "  CAST(doc_id AS VARCHAR) || '-' || CAST(fs[i].sp AS VARCHAR) AS section_start_reference,\n" +
      "  CAST(doc_id AS VARCHAR) || '-' || CAST(fs[i].ep AS VARCHAR) AS section_end_reference,\n" +
      "  FALSE AS overlap_violation\n" +
      "FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)\n" +
      "ORDER BY document_id, chapter_number, section_number"

  /** q_enrich_pages: chapter summary = '[FINAL tag8] first2', one row per
    * page (single segment: estimateA(chapterText) ≪ 78k at fixture scale). */
  val enrichPages: String =
    s"WITH fx AS ($pagesSelect),\n" +
      "chap AS (\n" +
      "  SELECT doc_id, list(content ORDER BY p) AS cl, count(*) AS np\n" +
      "  FROM fx GROUP BY doc_id\n" +
      "), summ AS (\n" +
      s"  SELECT doc_id, np, '[FINAL ' || $fnvTag8 || '] ' || $first2 AS summary\n" +
      "  FROM (\n" +
      "    SELECT doc_id, np, ct, regexp_replace(trim(ct), '\\s+', ' ', 'g') AS coll\n" +
      "    FROM (SELECT doc_id, np, array_to_string(cl, chr(10) || chr(10)) AS ct FROM chap))\n" +
      ")\n" +
      "SELECT 'DOC_' || CAST(f.doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  CAST(f.doc_id AS INTEGER) AS chapter_number,\n" +
      "  CAST(f.p AS INTEGER) AS page_number,\n" +
      "  CAST(s.np AS INTEGER) AS chapter_page_count,\n" +
      "  CAST(length(s.summary) AS INTEGER) AS summary_len,\n" +
      "  md5(s.summary) AS summary_fp\n" +
      "FROM fx f JOIN summ s ON f.doc_id = s.doc_id\n" +
      "ORDER BY document_id, chapter_number, page_number"

  /** q_enrich_section_summaries: 'hierarchy\n\n(N prior) first2' with
    * N = section_number − 1 (chapters have ≤ 3 sections, so the 5-window
    * never clips). */
  val enrichSectionSummaries: String =
    s"$fxPrefix,\n" +
      "secrows AS (\n" +
      "  SELECT doc_id, i, fs[i].title AS title,\n" +
      "    regexp_replace(trim(fs[i].c), '\\s+', ' ', 'g') AS coll\n" +
      "  FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)\n" +
      "), fullsum AS (\n" +
      "  SELECT doc_id, i,\n" +
      s"    title || chr(10) || chr(10) || '(' || CAST(i - 1 AS VARCHAR) || ' prior) ' || $first2 AS s\n" +
      "  FROM secrows\n" +
      ")\n" +
      "SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  CAST(doc_id AS INTEGER) AS chapter_number,\n" +
      "  CAST(i AS INTEGER) AS section_number,\n" +
      "  CAST(length(s) AS INTEGER) AS summary_len,\n" +
      "  md5(s) AS summary_fp,\n" +
      "  CAST(i - 1 AS INTEGER) AS n_context\n" +
      "FROM fullsum\n" +
      "ORDER BY document_id, chapter_number, section_number"

  // ---- the chunker (T8) -------------------------------------------

  /** Tokens.estimateB over a string expression — the same mirror the
    * token-estimator oracle uses (word-weight blend, trunc toward zero). */
  private def estB(s: String): String =
    s"CASE WHEN length($s) = 0 THEN 0 ELSE " +
      s"CAST(TRUNC(list_sum(list_transform(regexp_extract_all($s, '\\b\\w+\\b|[^\\w\\s]'), " +
      "w -> CASE WHEN length(w) <= 3 THEN 1.0 WHEN length(w) <= 7 THEN 1.3 " +
      s"ELSE length(w) / 4.5 END)) * 0.7 + length($s) / 4.0 * 0.3) AS INTEGER) END"

  /** One scan of section content `c` collecting typed break points
    * (0-based, matching the Scala regex match positions; `i` is the
    * 1-based SQL index). The corpus is pure lowercase words — no [,;]
    * anywhere (checked at every fixture scale), so comma breaks (prio 5)
    * cannot occur, and every 8-word ". Cap" boundary IS a sentence break
    * (capitalize of an [a-z] word always yields [A-Z]). Breaks never land
    * inside tag zones: tags contain no newline and no '.', so the inZone
    * guard is structurally satisfied. */
  private val breaksScan: String =
    "list_filter(list_transform(range(1, length(c) + 1), i ->\n" +
      "  CASE\n" +
      "    WHEN substr(c, i, 1) = chr(10) AND\n" +
      "         (substr(c, i + 1, 3) = '## ' OR substr(c, i + 1, 3) = '###')\n" +
      "      THEN {'p': i - 1, 'prio': 1}\n" +
      "    WHEN substr(c, i, 2) = chr(10) || chr(10) AND\n" +
      "         (i = 1 OR substr(c, i - 1, 1) <> chr(10))\n" +
      "      THEN {'p': i - 1, 'prio': 2}\n" +
      "    WHEN substr(c, i, 1) = chr(10) AND substr(c, i + 1, 2) = '- '\n" +
      "      THEN {'p': i - 1, 'prio': 3}\n" +
      "    WHEN substr(c, i, 1) = '.' AND substr(c, i + 1, 1) = ' ' AND\n" +
      "         substr(c, i + 2, 1) BETWEEN 'A' AND 'Z'\n" +
      "      THEN {'p': i, 'prio': 4}\n" +
      "    ELSE NULL END),\n" +
      "  x -> x IS NOT NULL)"

  /** Tag-open positions for findBestBreak's no-candidate fallback
    * (unreachable on this corpus — breaks recur every ~55 chars and the
    * window is 1,200 chars wide — but mirrored for exactness). */
  private val zonesScan: String =
    "list_filter(list_transform(range(1, length(c) + 1), i ->\n" +
      "  CASE WHEN substr(c, i, 4) = '<!--' THEN i - 1 ELSE NULL END),\n" +
      "  x -> x IS NOT NULL)"

  /** Greedy-cut selection: min over candidates of
    * key = prio·10^10 + |p − ideal|·10^5 + p — decodes to the exact
    * candidate Scala's minBy((priority, dist)) picks, including the
    * first-on-tie rule (smallest position last in the key). */
  private val nextCut: String =
    "CASE WHEN len(cand_keys) > 0 THEN CAST(list_min(cand_keys) % 100000 AS BIGINT)\n" +
      "     WHEN len(zone_cands) > 0 THEN CAST(list_min(zone_cands) AS BIGINT)\n" +
      "     ELSE least(pos + 3200, length(c)) END"

  /** CTE chain `secs, single, multi0, multi, g` — section contents →
    * chunk cut positions via the T8 greedy loop (Chunker.Config defaults:
    * min 500 / max 750 / hardMax 800 / 4 chars-per-token ⇒ window
    * [pos+2000, pos+3200], ideal pos+2500). Requires a WITH RECURSIVE
    * prefix. `g` rows carry cumulative cut positions; consecutive pairs
    * are chunks. */
  private val chunkerCtes: String =
    "secs AS (\n" +
      "  SELECT doc_id, i AS section_number, fs[i].c AS c,\n" +
      s"    ${estB("fs[i].c")} AS total_tok\n" +
      "  FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)\n" +
      "),\n" +
      "single AS (\n" +
      "  SELECT doc_id, section_number, 1 AS chunk_number,\n" +
      "    total_tok AS chunk_token_count, length(c) AS n_chars\n" +
      "  FROM secs WHERE total_tok <= 750\n" +
      "),\n" +
      "multi0 AS (\n" +
      s"  SELECT doc_id, section_number, c, $breaksScan AS bks0, $zonesScan AS zs\n" +
      "  FROM secs WHERE total_tok > 750\n" +
      "),\n" +
      "multi AS (\n" +
      "  SELECT doc_id, section_number, c,\n" +
      "    list_filter(bks0, b -> b.prio <> 2 OR\n" +
      "      len(list_filter(bks0, h -> h.prio = 1 AND abs(h.p - b.p) < 10)) = 0)\n" +
      "      AS bks,\n" +
      "    zs\n" +
      "  FROM multi0\n" +
      "),\n" +
      "g AS (\n" +
      "  SELECT doc_id, section_number, c, bks, zs,\n" +
      "    CAST(0 AS BIGINT) AS pos, 0 AS chunk_no, FALSE AS done\n" +
      "  FROM multi\n" +
      "  UNION ALL\n" +
      "  SELECT doc_id, section_number, c, bks, zs,\n" +
      "    CASE WHEN rem <= 750 THEN CAST(length(c) AS BIGINT) ELSE nxt END AS pos,\n" +
      "    chunk_no + 1 AS chunk_no,\n" +
      "    rem <= 750 AS done\n" +
      "  FROM (\n" +
      "    SELECT doc_id, section_number, c, bks, zs, pos, chunk_no, rem,\n" +
      s"      $nextCut AS nxt\n" +
      "    FROM (\n" +
      "      SELECT doc_id, section_number, c, bks, zs, pos, chunk_no,\n" +
      s"        ${estB("substr(c, CAST(pos AS BIGINT) + 1)")} AS rem,\n" +
      "        list_transform(\n" +
      "          list_filter(bks, b -> b.p >= pos + 2000\n" +
      "            AND b.p <= least(pos + 3200, length(c)) AND b.p > pos),\n" +
      "          b -> b.prio * 10000000000 + abs(b.p - (pos + 2500)) * 100000 + b.p)\n" +
      "          AS cand_keys,\n" +
      "        list_filter(zs, z -> z >= pos + 2000\n" +
      "          AND z <= least(pos + 3200, length(c)) AND z > pos) AS zone_cands\n" +
      "      FROM g WHERE NOT done AND pos < length(c)\n" +
      "    )\n" +
      "  )\n" +
      ")"

  /** Shared recursive prefix: pages + sections + the chunker loop. */
  private val fxChunkPrefix: String =
    s"WITH RECURSIVE fx AS ($pagesSelect),\nfx_body AS (SELECT doc_id, p, content FROM fx),\n$sectionsCtes,\n$chunkerCtes"

  /** q_pipe_chunks: the T8 chunk inventory, value-exact — single-chunk
    * sections pass through whole; multi-chunk sections replay the greedy
    * priority-cut loop in a recursive CTE. */
  val pipeChunks: String =
    s"$fxChunkPrefix,\n" +
      "chunks AS (\n" +
      "  SELECT a.doc_id, a.section_number, a.chunk_no AS chunk_number,\n" +
      "    substr(a.c, CAST(b.pos AS BIGINT) + 1, CAST(a.pos - b.pos AS BIGINT)) AS chunk\n" +
      "  FROM g a JOIN g b\n" +
      "    ON a.doc_id = b.doc_id AND a.section_number = b.section_number\n" +
      "   AND a.chunk_no = b.chunk_no + 1\n" +
      "),\n" +
      "multirows AS (\n" +
      "  SELECT doc_id, section_number, chunk_number,\n" +
      s"    ${estB("chunk")} AS chunk_token_count, length(chunk) AS n_chars\n" +
      "  FROM chunks\n" +
      "),\n" +
      "allrows AS (\n" +
      "  SELECT * FROM single UNION ALL SELECT * FROM multirows\n" +
      ")\n" +
      "SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  CAST(doc_id AS INTEGER) AS chapter_number,\n" +
      "  CAST(section_number AS INTEGER) AS section_number,\n" +
      "  CAST(chunk_number AS INTEGER) AS chunk_number,\n" +
      "  CAST(chunk_token_count AS INTEGER) AS chunk_token_count,\n" +
      "  CAST(n_chars AS INTEGER) AS n_chars\n" +
      "FROM allrows\n" +
      "ORDER BY document_id, chapter_number, section_number, chunk_number"

  /** q_pipe_chunks_corrected: W7 span→page-range overlap assignment over
    * the chapter's chunk concatenation. On this corpus every chunk span
    * (≥2,000 chars) overlaps a page range, so the W8–W10 inference steps
    * never fire, and consecutive chunks share boundary pages (the W11
    * clamp is idle). Page ranges honor the W4 duplicate-header rule: a
    * page's range opens at its FIRST header occurrence (the intro's
    * embedded hdr(q) copy), and closes at its footer's '-->'. */
  val pipeChunksCorrected: String =
    s"$fxChunkPrefix,\n" +
      "allchunks AS (\n" +
      "  SELECT doc_id, section_number, 1 AS chunk_number,\n" +
      "    CAST(0 AS BIGINT) AS off, length(c) AS len\n" +
      "  FROM secs WHERE total_tok <= 750\n" +
      "  UNION ALL\n" +
      "  SELECT a.doc_id, a.section_number, a.chunk_no AS chunk_number,\n" +
      "    b.pos AS off, a.pos - b.pos AS len\n" +
      "  FROM g a JOIN g b\n" +
      "    ON a.doc_id = b.doc_id AND a.section_number = b.section_number\n" +
      "   AND a.chunk_no = b.chunk_no + 1\n" +
      "),\n" +
      "secoff AS (\n" +
      "  SELECT doc_id, i AS section_number,\n" +
      "    COALESCE(CAST(SUM(length(fs[i].c)) OVER (PARTITION BY doc_id\n" +
      "      ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)\n" +
      "      AS BIGINT), 0) AS soff\n" +
      "  FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)\n" +
      "),\n" +
      "chapfull AS (\n" +
      "  SELECT doc_id, array_to_string(list_transform(fs, s -> s.c), '') AS cc,\n" +
      "    length(CAST(doc_id AS VARCHAR)) AS dlen\n" +
      "  FROM fx_merged\n" +
      "),\n" +
      "tags AS (\n" +
      "  SELECT doc_id,\n" +
      "    unnest(list_filter(list_transform(range(1, length(cc) + 1), i ->\n" +
      "      CASE WHEN substr(cc, i, 16) = '<!-- PageHeader '\n" +
      "        THEN {'p0': i - 1, 'typ': 'h', 'pg': CAST(substr(cc, i + 28, 1) AS INTEGER)}\n" +
      "      WHEN substr(cc, i, 16) = '<!-- PageFooter '\n" +
      "        THEN {'p0': i - 1, 'typ': 'f', 'pg': CAST(substr(cc, i + 28, 1) AS INTEGER)}\n" +
      "      ELSE NULL END), x -> x IS NOT NULL)) AS tg,\n" +
      "    dlen\n" +
      "  FROM chapfull\n" +
      "),\n" +
      "pranges AS (\n" +
      "  SELECT doc_id, tg.pg AS pg,\n" +
      "    MIN(CASE WHEN tg.typ = 'h' THEN tg.p0 END) AS rs,\n" +
      "    MAX(CASE WHEN tg.typ = 'f' THEN tg.p0 + 52 + dlen END) AS re\n" +
      "  FROM tags GROUP BY doc_id, tg.pg\n" +
      "),\n" +
      "spans AS (\n" +
      "  SELECT ac.doc_id, ac.section_number, ac.chunk_number,\n" +
      "    so.soff + ac.off AS s,\n" +
      "    so.soff + ac.off + ac.len - 1 AS e\n" +
      "  FROM allchunks ac JOIN secoff so\n" +
      "    ON ac.doc_id = so.doc_id AND ac.section_number = so.section_number\n" +
      "),\n" +
      "assigned AS (\n" +
      "  SELECT sp.doc_id, sp.section_number, sp.chunk_number,\n" +
      "    MIN(pr.pg) AS sp_page, MAX(pr.pg) AS ep_page\n" +
      "  FROM spans sp JOIN pranges pr\n" +
      "    ON sp.doc_id = pr.doc_id AND sp.s <= pr.re AND sp.e >= pr.rs\n" +
      "  GROUP BY 1, 2, 3\n" +
      ")\n" +
      "SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  CAST(doc_id AS INTEGER) AS chapter_number,\n" +
      "  CAST(section_number AS INTEGER) AS section_number,\n" +
      "  CAST(chunk_number AS INTEGER) AS chunk_number,\n" +
      "  CAST(sp_page AS INTEGER) AS chunk_start_page,\n" +
      "  CAST(ep_page AS INTEGER) AS chunk_end_page,\n" +
      "  CAST(doc_id AS VARCHAR) || '-' || CAST(sp_page AS VARCHAR) AS chunk_start_reference,\n" +
      "  CAST(doc_id AS VARCHAR) || '-' || CAST(ep_page AS VARCHAR) AS chunk_end_reference,\n" +
      "  FALSE AS overlap_violation,\n" +
      "  FALSE AS unassigned\n" +
      "FROM assigned\n" +
      "ORDER BY document_id, chapter_number, section_number, chunk_number"

  /** q_enrich_embedding_audit: chunk counts per document with blank
    * chunks (tag-only content — the unmerged header-only intros — whose
    * PageTags.clean is empty) embedding as null; dims and norms are
    * deterministic-enricher invariants, violations identically zero. */
  val enrichEmbeddingAudit: String =
    s"$fxChunkPrefix,\n" +
      "allchunktexts AS (\n" +
      "  SELECT doc_id, c AS txt FROM secs WHERE total_tok <= 750\n" +
      "  UNION ALL\n" +
      "  SELECT a.doc_id, substr(a.c, CAST(b.pos AS BIGINT) + 1, CAST(a.pos - b.pos AS BIGINT)) AS txt\n" +
      "  FROM g a JOIN g b\n" +
      "    ON a.doc_id = b.doc_id AND a.section_number = b.section_number\n" +
      "   AND a.chunk_no = b.chunk_no + 1\n" +
      "),\n" +
      "flags AS (\n" +
      "  SELECT doc_id,\n" +
      "    CASE WHEN trim(regexp_replace(txt,\n" +
      "      '(?i)<!--\\s*Page(?:Header|Footer)[^>]*?-->', '', 'g')) = ''\n" +
      "    THEN 1 ELSE 0 END AS blank\n" +
      "  FROM allchunktexts\n" +
      ")\n" +
      "SELECT 'DOC_' || CAST(doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  CAST(count(*) AS BIGINT) AS n_chunks,\n" +
      "  CAST(count(*) - sum(blank) AS BIGINT) AS n_embedded,\n" +
      "  CAST(0 AS BIGINT) AS dim_violations,\n" +
      "  CAST(0 AS BIGINT) AS norm_violations\n" +
      "FROM flags GROUP BY document_id ORDER BY document_id"

  // ---- the 28-column full export ----------------------------------

  /** FNV-1a 64-bit limbs over an arbitrary string expression (same limb
    * recurrence as `fnvTag8`, which is fixed to column `ct`). */
  private def fnvLimbs(expr: String): String =
    "list_reduce(\n" +
      "  list_prepend({'h': CAST(3421674724 AS BIGINT), 'l': CAST(2216829733 AS BIGINT)},\n" +
      s"    list_transform(CASE WHEN length($expr) = 0 THEN [] ELSE string_split($expr, '') END,\n" +
      "      c -> {'h': CAST(0 AS BIGINT), 'l': CAST(unicode(c) AS BIGINT)})),\n" +
      "  (a, x) -> {'h': ((xor(a.l, x.l) * 435) // 4294967296\n" +
      "                 + (a.h * 435) % 4294967296\n" +
      "                 + (xor(a.l, x.l) % 16777216) * 256) % 4294967296,\n" +
      "             'l': (xor(a.l, x.l) * 435) % 4294967296})"

  /** Scale-15 fixed-point component rendering — the exact integer
    * assembly DbExport.componentLiteral uses, so the literal text is
    * engine-identical by construction (u = round(x·10¹⁵) of the same
    * IEEE double; both engines round half away from zero). */
  private def comp15(x: String): String = {
    val u = s"CAST(ROUND(CAST($x AS DOUBLE) * 1000000000000000.0) AS BIGINT)"
    s"(CASE WHEN $u < 0 THEN '-' ELSE '' END" +
      s" || substr(lpad(CAST(abs($u) AS VARCHAR), 16, '0'), 1, 1)" +
      s" || '.' || substr(lpad(CAST(abs($u) AS VARCHAR), 16, '0'), 2, 15))"
  }

  /** q_pipe_full_export: the capstone — all 28 DB columns value-exact,
    * INCLUDING the float32 embedding payload. The DeterministicEnricher
    * embedding is md5-free but FNV-derived: base = FNV64(cleaned chunk),
    * dim d = FNV64('base:d') >>> 40 mapped to [-1,1) in float32, then
    * unit-normalized in float32 (norm summed in double, subspace order).
    * DuckDB replays every step — FNV limbs, the exact float ops (FLOAT
    * arithmetic in DuckDB is true single precision; the decimal cast
    * detour is avoided because DuckDB scales floats in float), and the
    * scale-15 literal. Blank chunks (tag-only, clean() empty) export the
    * empty-string literal, mirroring the P9 null-embedding rule. */
  // Assembled from section-sized vals: one monolithic +-chain of this
  // length blows the compiler's expression-tree stack.
  private val feChunkCtes: String =
    s"$fxChunkPrefix,\n" +
      "chunktexts AS (\n" +
      "  SELECT doc_id, section_number, 1 AS chunk_number,\n" +
      "    CAST(0 AS BIGINT) AS off, CAST(length(c) AS BIGINT) AS len, c AS txt\n" +
      "  FROM secs WHERE total_tok <= 750\n" +
      "  UNION ALL\n" +
      "  SELECT a.doc_id, a.section_number, a.chunk_no AS chunk_number,\n" +
      "    b.pos AS off, a.pos - b.pos AS len,\n" +
      "    substr(a.c, CAST(b.pos AS BIGINT) + 1, CAST(a.pos - b.pos AS BIGINT)) AS txt\n" +
      "  FROM g a JOIN g b\n" +
      "    ON a.doc_id = b.doc_id AND a.section_number = b.section_number\n" +
      "   AND a.chunk_no = b.chunk_no + 1\n" +
      "),\n" +
      "secoff AS (\n" +
      "  SELECT doc_id, i AS section_number,\n" +
      "    COALESCE(CAST(SUM(length(fs[i].c)) OVER (PARTITION BY doc_id\n" +
      "      ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)\n" +
      "      AS BIGINT), 0) AS soff\n" +
      "  FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)\n" +
      "),\n" +
      "chapfull AS (\n" +
      "  SELECT doc_id, array_to_string(list_transform(fs, s -> s.c), '') AS cc,\n" +
      "    length(CAST(doc_id AS VARCHAR)) AS dlen\n" +
      "  FROM fx_merged\n" +
      "),\n" +
      "tags AS (\n" +
      "  SELECT doc_id,\n" +
      "    unnest(list_filter(list_transform(range(1, length(cc) + 1), i ->\n" +
      "      CASE WHEN substr(cc, i, 16) = '<!-- PageHeader '\n" +
      "        THEN {'p0': i - 1, 'typ': 'h', 'pg': CAST(substr(cc, i + 28, 1) AS INTEGER)}\n" +
      "      WHEN substr(cc, i, 16) = '<!-- PageFooter '\n" +
      "        THEN {'p0': i - 1, 'typ': 'f', 'pg': CAST(substr(cc, i + 28, 1) AS INTEGER)}\n" +
      "      ELSE NULL END), x -> x IS NOT NULL)) AS tg,\n" +
      "    dlen\n" +
      "  FROM chapfull\n" +
      "),\n" +
      "pranges AS (\n" +
      "  SELECT doc_id, tg.pg AS pg,\n" +
      "    MIN(CASE WHEN tg.typ = 'h' THEN tg.p0 END) AS rs,\n" +
      "    MAX(CASE WHEN tg.typ = 'f' THEN tg.p0 + 52 + dlen END) AS re\n" +
      "  FROM tags GROUP BY doc_id, tg.pg\n" +
      "),\n" +
      "assigned AS (\n" +
      "  SELECT ct.doc_id, ct.section_number, ct.chunk_number,\n" +
      "    MIN(pr.pg) AS sp_page, MAX(pr.pg) AS ep_page\n" +
      "  FROM chunktexts ct\n" +
      "  JOIN secoff so ON ct.doc_id = so.doc_id AND ct.section_number = so.section_number\n" +
      "  JOIN pranges pr ON ct.doc_id = pr.doc_id\n" +
      "    AND so.soff + ct.off <= pr.re AND so.soff + ct.off + ct.len - 1 >= pr.rs\n" +
      "  GROUP BY 1, 2, 3\n" +
      ")"

  private val feSummaryCtes: String =
    "chap AS (\n" +
      "  SELECT doc_id, list(content ORDER BY p) AS cl, count(*) AS np\n" +
      "  FROM fx GROUP BY doc_id\n" +
      "),\n" +
      "summ AS (\n" +
      s"  SELECT doc_id, np, '[FINAL ' || $fnvTag8 || '] ' || $first2 AS summary\n" +
      "  FROM (\n" +
      "    SELECT doc_id, np, ct, regexp_replace(trim(ct), '\\s+', ' ', 'g') AS coll\n" +
      "    FROM (SELECT doc_id, np, array_to_string(cl, chr(10) || chr(10)) AS ct FROM chap))\n" +
      "),\n" +
      "secrows AS (\n" +
      "  SELECT doc_id, i, fs[i].title AS title, fs[i].sp AS sp, fs[i].ep AS ep,\n" +
      "    regexp_replace(trim(fs[i].c), '\\s+', ' ', 'g') AS coll\n" +
      "  FROM fx_merged, UNNEST(generate_series(1, len(fs))) AS t(i)\n" +
      "),\n" +
      "fullsum AS (\n" +
      "  SELECT doc_id, i,\n" +
      s"    title || chr(10) || chr(10) || '(' || CAST(i - 1 AS VARCHAR) || ' prior) ' || $first2 AS s,\n" +
      "    sp, ep\n" +
      "  FROM secrows\n" +
      ")"

  private val feEmbedCtes: String =
    "cleaned AS (\n" +
      "  SELECT doc_id, section_number, chunk_number, txt,\n" +
      "    trim(regexp_replace(\n" +
      "      regexp_replace(\n" +
      "        regexp_replace(txt, '(?i)<!--\\s*PageHeader[^>]*?-->', '', 'g'),\n" +
      "        '(?i)<!--\\s*PageFooter[^>]*?-->', '', 'g'),\n" +
      "      chr(10) || chr(10) || chr(10) || '+', chr(10) || chr(10), 'g'),\n" +
      "      ' ' || chr(10) || chr(9) || chr(13)) AS ct\n" +
      "  FROM chunktexts\n" +
      "),\n" +
      "ebase AS (\n" +
      s"  SELECT doc_id, section_number, chunk_number, ${fnvLimbs("ct")} AS hb\n" +
      "  FROM cleaned WHERE ct <> ''\n" +
      "),\n" +
      "esgn AS (\n" +
      "  SELECT doc_id, section_number, chunk_number,\n" +
      "    (CASE WHEN hb.h >= 2147483648 THEN hb.h - 4294967296 ELSE hb.h END)\n" +
      "      * 4294967296 + hb.l AS sgn\n" +
      "  FROM ebase\n" +
      "),\n" +
      "edims AS (\n" +
      "  SELECT doc_id, section_number, chunk_number, sgn,\n" +
      "    CAST(unnest(range(0, 64)) AS INT) AS dim\n" +
      "  FROM esgn\n" +
      "),\n" +
      "ehd AS (\n" +
      "  SELECT doc_id, section_number, chunk_number, dim,\n" +
      s"    ${fnvLimbs("CAST(sgn AS VARCHAR) || ':' || CAST(dim AS VARCHAR)")} AS hb\n" +
      "  FROM edims\n" +
      "),\n" +
      "exf AS (\n" +
      "  SELECT doc_id, section_number, chunk_number, dim,\n" +
      "    CAST(CAST(hb.h // 256 AS FLOAT) / CAST(8388608 AS FLOAT)\n" +
      "      - CAST(1 AS FLOAT) AS FLOAT) AS x\n" +
      "  FROM ehd\n" +
      "),\n" +
      "evf AS (\n" +
      "  SELECT doc_id, section_number, chunk_number, list(x ORDER BY dim) AS v\n" +
      "  FROM exf GROUP BY 1, 2, 3\n" +
      "),\n" +
      "enrm AS (\n" +
      "  SELECT doc_id, section_number, chunk_number, v,\n" +
      "    CAST(sqrt(list_sum(list_transform(v,\n" +
      "      e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) AS FLOAT) AS nf\n" +
      "  FROM evf\n" +
      "),\n" +
      "elit AS (\n" +
      "  SELECT doc_id, section_number, chunk_number,\n" +
      "    '[' || array_to_string(list_transform(\n" +
      "      CASE WHEN nf = 0 THEN v\n" +
      "           ELSE list_transform(v, e -> CAST(e / nf AS FLOAT)) END,\n" +
      s"      e -> ${comp15("e")}), ',') || ']' AS emb\n" +
      "  FROM enrm\n" +
      ")"

  private val feSelect: String =
    "SELECT\n" +
      "  CAST(NULL AS VARCHAR) AS id,\n" +
      "  'DOC_' || CAST(ct.doc_id % 3 AS VARCHAR) AS document_id,\n" +
      "  'doc_' || CAST(ct.doc_id AS VARCHAR) || '.pdf' AS filename,\n" +
      "  '/corpus/doc_' || CAST(ct.doc_id AS VARCHAR) || '.pdf' AS filepath,\n" +
      "  'source_' || CAST(ct.doc_id % 3 AS VARCHAR) || '.pdf' AS source_filename,\n" +
      "  CAST(ct.doc_id AS INTEGER) AS chapter_number,\n" +
      "  'Chapter ' || CAST(ct.doc_id AS VARCHAR) AS chapter_name,\n" +
      "  sm.summary AS chapter_summary,\n" +
      "  CAST(sm.np AS INTEGER) AS chapter_page_count,\n" +
      "  CAST(ct.section_number AS INTEGER) AS section_number,\n" +
      "  fsu.s AS section_summary,\n" +
      "  CAST(fsu.sp AS INTEGER) AS section_start_page,\n" +
      "  CAST(fsu.ep AS INTEGER) AS section_end_page,\n" +
      "  CAST(fsu.ep - fsu.sp + 1 AS INTEGER) AS section_page_count,\n" +
      "  CAST(NULL AS VARCHAR) AS section_start_reference,\n" +
      "  CAST(NULL AS VARCHAR) AS section_end_reference,\n" +
      "  CAST(ct.chunk_number AS INTEGER) AS chunk_number,\n" +
      "  ct.txt AS chunk_content,\n" +
      "  CAST(asg.sp_page AS INTEGER) AS chunk_start_page,\n" +
      "  CAST(asg.ep_page AS INTEGER) AS chunk_end_page,\n" +
      "  CAST(ct.doc_id AS VARCHAR) || '-' || CAST(asg.sp_page AS VARCHAR) AS chunk_start_reference,\n" +
      "  CAST(ct.doc_id AS VARCHAR) || '-' || CAST(asg.ep_page AS VARCHAR) AS chunk_end_reference,\n" +
      "  COALESCE(el.emb, '') AS embedding,\n" +
      "  CAST(NULL AS VARCHAR) AS extra1,\n" +
      "  CAST(NULL AS VARCHAR) AS extra2,\n" +
      "  CAST(NULL AS VARCHAR) AS extra3,\n" +
      "  CAST(NULL AS VARCHAR) AS created_at,\n" +
      "  CAST(NULL AS VARCHAR) AS last_modified\n" +
      "FROM chunktexts ct\n" +
      "JOIN assigned asg ON asg.doc_id = ct.doc_id\n" +
      "  AND asg.section_number = ct.section_number AND asg.chunk_number = ct.chunk_number\n" +
      "JOIN summ sm ON sm.doc_id = ct.doc_id\n" +
      "JOIN fullsum fsu ON fsu.doc_id = ct.doc_id AND fsu.i = ct.section_number\n" +
      "LEFT JOIN elit el ON el.doc_id = ct.doc_id\n" +
      "  AND el.section_number = ct.section_number AND el.chunk_number = ct.chunk_number\n" +
      "ORDER BY document_id, chapter_number, section_number, chunk_number"

  val fullExport: String =
    s"$feChunkCtes,\n$feSummaryCtes,\n$feEmbedCtes\n$feSelect"

  /** q_pipe_retrieve: the production RAG read path over the exported
    * chunks — the SAME chunk + FNV-embedding CTEs as `fullExport`, a
    * query embedding built by replaying the DeterministicEnricher on the
    * query literal (FNV limbs → signed base → 64 float dims → float
    * normalize), exact cosine in double over the float components, top-k
    * with id tiebreaks, and the chunk page-reference citation columns.
    * `queryText` must be single-quote-free (it is inlined as a SQL
    * literal). */
  def retrieve(queryText: String, k: Int): String = {
    require(!queryText.contains("'"), "query literal must not contain quotes")
    s"$feChunkCtes,\n$feEmbedCtes,\n" +
      "qbase AS (\n" +
      s"  SELECT ${fnvLimbs(s"'$queryText'")} AS hb\n" +
      "),\n" +
      "qsgn AS (\n" +
      "  SELECT (CASE WHEN hb.h >= 2147483648 THEN hb.h - 4294967296 ELSE hb.h END)\n" +
      "    * 4294967296 + hb.l AS sgn\n" +
      "  FROM qbase\n" +
      "),\n" +
      "qdims AS (\n" +
      "  SELECT sgn, CAST(unnest(range(0, 64)) AS INT) AS dim FROM qsgn\n" +
      "),\n" +
      "qhd AS (\n" +
      s"  SELECT dim, ${fnvLimbs("CAST(sgn AS VARCHAR) || ':' || CAST(dim AS VARCHAR)")} AS hb\n" +
      "  FROM qdims\n" +
      "),\n" +
      "qxf AS (\n" +
      "  SELECT dim,\n" +
      "    CAST(CAST(hb.h // 256 AS FLOAT) / CAST(8388608 AS FLOAT)\n" +
      "      - CAST(1 AS FLOAT) AS FLOAT) AS x\n" +
      "  FROM qhd\n" +
      "),\n" +
      "qvf AS (SELECT list(x ORDER BY dim) AS v FROM qxf),\n" +
      "qn AS (\n" +
      "  SELECT v, CAST(sqrt(list_sum(list_transform(v,\n" +
      "    e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) AS FLOAT) AS nf\n" +
      "  FROM qvf\n" +
      "),\n" +
      "qvec AS (\n" +
      "  SELECT CASE WHEN nf = 0 THEN v\n" +
      "         ELSE list_transform(v, e -> CAST(e / nf AS FLOAT)) END AS qv\n" +
      "  FROM qn\n" +
      "),\n" +
      "cvec AS (\n" +
      "  SELECT doc_id, section_number, chunk_number,\n" +
      "    CASE WHEN nf = 0 THEN v\n" +
      "         ELSE list_transform(v, e -> CAST(e / nf AS FLOAT)) END AS cv\n" +
      "  FROM enrm\n" +
      "),\n" +
      "rscored AS (\n" +
      "  SELECT c.doc_id, c.section_number, c.chunk_number,\n" +
      "    ROUND(list_sum(list_transform(range(1, 65),\n" +
      "      i -> CAST(c.cv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))), 6) AS cos_sim\n" +
      "  FROM cvec c, qvec q\n" +
      "),\n" +
      "rtop AS (\n" +
      "  SELECT doc_id, section_number, chunk_number, cos_sim FROM rscored\n" +
      s"  ORDER BY cos_sim DESC, doc_id, section_number, chunk_number LIMIT $k\n" +
      ")\n" +
      "SELECT\n" +
      "  ROW_NUMBER() OVER (ORDER BY t.cos_sim DESC, t.doc_id,\n" +
      "    t.section_number, t.chunk_number) AS rk,\n" +
      "  t.cos_sim,\n" +
      "  CAST(t.doc_id AS INTEGER) AS chapter_number,\n" +
      "  CAST(t.section_number AS INTEGER) AS section_number,\n" +
      "  CAST(t.chunk_number AS INTEGER) AS chunk_number,\n" +
      "  CAST(asg.sp_page AS INTEGER) AS chunk_start_page,\n" +
      "  CAST(asg.ep_page AS INTEGER) AS chunk_end_page,\n" +
      "  CAST(t.doc_id AS VARCHAR) || '-' || CAST(asg.sp_page AS VARCHAR) AS chunk_start_reference,\n" +
      "  CAST(t.doc_id AS VARCHAR) || '-' || CAST(asg.ep_page AS VARCHAR) AS chunk_end_reference\n" +
      "FROM rtop t\n" +
      "JOIN assigned asg ON asg.doc_id = t.doc_id\n" +
      "  AND asg.section_number = t.section_number AND asg.chunk_number = t.chunk_number\n" +
      "ORDER BY rk"
  }

  /** q_catalog_page_sections: the char-split path of NaturalSections
    * (T10), including the dropped-gap quirk — section 1 ends at the
    * backtracked whitespace, section 2 still starts at len/2. */
  val catalogPageSections: String =
    "WITH base AS (\n" +
      "  SELECT doc_id, trim(COALESCE(text, '')) AS t FROM documents\n" +
      "), calc AS (\n" +
      "  SELECT doc_id, t, length(t) AS n,\n" +
      "    length(t) // 2 AS end0,\n" +
      "    GREATEST(0, length(t) // 2 - 50) AS ss,\n" +
      "    LEAST(length(t) // 2, length(t) - 1) AS jmax\n" +
      "  FROM base WHERE length(t) > 0\n" +
      "), cut AS (\n" +
      "  SELECT doc_id, t, n, end0,\n" +
      "    CASE WHEN length(regexp_extract(reverse(substr(t, ss + 2, jmax - ss)), '^[^ ' || chr(10) || ']*'))\n" +
      "           < length(substr(t, ss + 2, jmax - ss))\n" +
      "      THEN jmax - length(regexp_extract(reverse(substr(t, ss + 2, jmax - ss)), '^[^ ' || chr(10) || ']*'))\n" +
      "      ELSE end0 END AS e\n" +
      "  FROM calc\n" +
      "), secs AS (\n" +
      "  SELECT doc_id, 1 AS section_id, trim(substr(t, 1, e)) AS s FROM cut\n" +
      "  UNION ALL\n" +
      "  SELECT doc_id, 2 AS section_id, trim(substr(t, end0 + 1)) AS s FROM cut\n" +
      "  UNION ALL\n" +
      "  SELECT doc_id, 1 AS section_id, '' AS s FROM base WHERE length(t) = 0\n" +
      "), keep AS (\n" +
      "  SELECT doc_id, section_id, s FROM secs\n" +
      "  WHERE s <> '' OR doc_id IN (SELECT doc_id FROM base WHERE length(t) = 0)\n" +
      ")\n" +
      "SELECT doc_id, CAST(section_id AS INTEGER) AS section_id,\n" +
      "  CAST(length(s) AS INTEGER) AS n_chars, md5(s) AS fp\n" +
      "FROM keep ORDER BY doc_id, section_id"
}
