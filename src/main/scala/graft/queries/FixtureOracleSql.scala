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
