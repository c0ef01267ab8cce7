#!/usr/bin/env python3
"""Generate golden outputs by RUNNING the reference's own pure functions
(/root/reference, read-only) over a deterministic synthetic corpus, for the
Scala ReferenceParitySpec to assert byte-level parity against.

Covers: T1/T2 token estimators, T8 chunker, T5 heading split, T7 small-
section merge, T11 tag strip, G6 tag embed, T12/W4 tag scan + page ranges,
W5 section page correction, W7-W11 chunk page correction.

Usage: python3 tools/gen_reference_golden.py  (writes
src/test/resources/reference_golden.jsonl)
"""
import importlib.util, json, random, sys

def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m

BASE = '/root/reference/semantic search/'
s02 = load('s02', BASE + 'stage_02_section_processing.py')
s02b = load('s02b', BASE + 'stage_02b_section_page_correction.py')
s03 = load('s03', BASE + 'stage_03_content_chunking.py')
s03b = load('s03b', BASE + 'stage_03b_chunk_page_correction.py')

# catalog stage3 needs stubs for its unavailable external deps
import types
for _name in ['smb', 'smb.SMBConnection', 'smb.smb_structs', 'openai',
              'requests', 'tqdm']:
    sys.modules.setdefault(_name, types.ModuleType(_name))
sys.modules['smb'].smb_structs = sys.modules['smb.smb_structs']
sys.modules['smb.SMBConnection'].SMBConnection = object
if not hasattr(sys.modules['openai'], 'OpenAI'):
    sys.modules['openai'].OpenAI = object
cs3 = load('cs3', '/root/reference/catalog search/stage3_generate_summaries.py')

rng = random.Random(42)
WORDS = ("the quick brown consolidation impairment lease revenue asset "
         "liability measurement disclosure recognition fair value entity "
         "contract performance obligation standard adjustment").split()

def words(n):
    return " ".join(rng.choice(WORDS) for _ in range(n))

def sentencey(n_sent, wps=9):
    return " ".join((words(wps).capitalize() + ".") for _ in range(n_sent))

def page_tag(kind, num, ref):
    return f'<!-- Page{kind} PageNumber="{num}" PageReference="{ref}" -->'

def markdown_doc(n_blocks, with_tags=False, heading_levels=(1, 2, 3)):
    parts = []
    page = 1
    for i in range(n_blocks):
        r = rng.random()
        if with_tags and r < 0.18:
            parts.append(page_tag("Header", page, f"{page}-r"))
            parts.append(sentencey(rng.randint(1, 4)))
            parts.append(page_tag("Footer", page, f"{page}-r"))
            page += 1
        elif r < 0.35:
            lvl = rng.choice(heading_levels)
            parts.append("#" * lvl + " " + words(3).title())
            parts.append(sentencey(rng.randint(1, 5)))
        elif r < 0.45:
            parts.append("- " + words(4) + "\n- " + words(4))
        else:
            parts.append(sentencey(rng.randint(2, 8)))
    return "\n\n".join(parts)

out = []

# --- tokens (T1 via stage_02's count_tokens == estimator A; T2 via s03) ---
tok = s03.SimpleTokenizer()
for i in range(40):
    t = (words(rng.randint(0, 300)) if i % 3 else sentencey(rng.randint(1, 40)))
    out.append({"kind": "tokens", "text": t,
                "tokensA": s02.count_tokens(t),
                "tokensB": tok.count_tokens(t)})

# --- T11 clean + G6 embed + metadata ---
for i in range(15):
    pages = [{"page_number": p + 1, "page_reference": f"{p+1}-r",
              "content": markdown_doc(rng.randint(1, 5), with_tags=(p % 2 == 0))}
             for p in range(rng.randint(1, 6))]
    embedded = s02.embed_page_tags(pages)
    meta = s02.extract_page_metadata(embedded)
    out.append({"kind": "embed", "pages": pages, "embedded": embedded,
                "cleaned": s02.clean_existing_page_tags(embedded),
                "meta_start": meta["section_start_page"],
                "meta_end": meta["section_end_page"],
                "meta_count": meta["section_page_count"]})

# --- T5 heading split ---
for i in range(20):
    content = markdown_doc(rng.randint(3, 14), with_tags=(i % 2 == 0))
    level = rng.choice([1, 2])
    secs = s02.split_by_heading_level(content, level, "Parent Title" if i % 3 else "")
    out.append({"kind": "headingSplit", "content": content, "level": level,
                "parent": "Parent Title" if i % 3 else "",
                "sections": [{"title": s["title"], "level": s["level"],
                              "content": s["content"],
                              "token_count": s["token_count"],
                              "start": s.get("section_start_page"),
                              "end": s.get("section_end_page"),
                              "count": s.get("section_page_count", 0)}
                             for s in secs]})

# --- T7 merge ---
for i in range(20):
    n = rng.randint(2, 8)
    secs = []
    for j in range(n):
        tokens = rng.choice([60, 120, 240, 400, 700])
        secs.append({"title": f"S{j}", "level": rng.choice([1, 2, 3]),
                     "content": words(tokens), "token_count": tokens,
                     "section_start_page": rng.choice([None, j + 1]),
                     "section_end_page": rng.choice([None, j + 2])})
    inp = [dict(s) for s in secs]
    merged = s02.merge_small_sections([dict(s) for s in secs])
    out.append({"kind": "merge", "input": inp,
                "merged": [{"title": m["title"], "level": m["level"],
                            "content": m["content"],
                            "token_count": m["token_count"],
                            "start": m.get("section_start_page"),
                            "end": m.get("section_end_page"),
                            "number": m.get("section_number")}
                           for m in merged]})

# --- T8 chunker ---
chunker = s03.Stage3Chunker()
for i in range(20):
    sizeup = 1 + (i % 4) * 3
    content = markdown_doc(rng.randint(4, 10) * sizeup, with_tags=(i % 2 == 0))
    section = {"document_id": "D", "filename": "f", "filepath": "p",
               "source_filename": "s", "chapter_number": 1,
               "chapter_name": "c", "chapter_summary": "", "chapter_page_count": 1,
               "section_number": 1, "section_summary": "",
               "section_start_page": 1, "section_end_page": 2,
               "section_page_count": 2, "section_start_reference": "",
               "section_end_reference": "", "section_content": content}
    chunks = chunker.chunk_section(section)
    out.append({"kind": "chunk", "content": content,
                "chunks": [c["chunk_content"] for c in chunks]})

# --- T12/W4 tag scan + ranges ---
for i in range(15):
    content = markdown_doc(rng.randint(4, 16), with_tags=True)
    tags = s02b.extract_page_tags_with_positions(content)
    ranges, refs = s02b.build_page_ranges(tags, content)
    out.append({"kind": "ranges", "content": content,
                "tags": [{"pos": t[0], "type": t[1], "page": t[2], "ref": t[3]}
                         for t in tags],
                "ranges": [{"start": r[0], "end": r[1], "page": r[2]}
                           for r in ranges],
                "refs": [{"page": k, "ref": v} for k, v in sorted(refs.items())]})

# --- W5 section page correction ---
for i in range(12):
    n = rng.randint(2, 6)
    secs = []
    for j in range(n):
        secs.append({"section_number": j + 1,
                     "section_content": markdown_doc(rng.randint(2, 6),
                                                     with_tags=(rng.random() < 0.6)),
                     "section_start_page": rng.choice([None, j + 1]),
                     "section_end_page": rng.choice([None, j + 2])})
    inp = [dict(s) for s in secs]
    corrected, _stats = s02b.process_chapter([dict(s) for s in secs])
    out.append({"kind": "sectionCorrection", "input": inp,
                "corrected": [{"number": c["section_number"],
                               "start": c.get("section_start_page"),
                               "end": c.get("section_end_page"),
                               "startRef": c.get("section_start_reference", ""),
                               "endRef": c.get("section_end_reference", "")}
                              for c in corrected]})

# --- W7-W11 chunk page correction ---
for i in range(12):
    chunks = []
    nsec = rng.randint(1, 4)
    for sj in range(nsec):
        for cj in range(rng.randint(1, 3)):
            chunks.append({"section_number": sj + 1, "chunk_number": cj + 1,
                           "chunk_content": markdown_doc(rng.randint(1, 5),
                                                         with_tags=(rng.random() < 0.5)),
                           "section_start_page": rng.choice([None, sj + 1]),
                           "section_end_page": rng.choice([None, sj + 3])})
    inp = [dict(c) for c in chunks]
    corrected, _stats = s03b.process_chapter_chunks([dict(c) for c in chunks])
    out.append({"kind": "chunkCorrection", "input": inp,
                "corrected": [{"section": c["section_number"],
                               "chunk": c["chunk_number"],
                               "start": c.get("chunk_start_page"),
                               "end": c.get("chunk_end_page"),
                               "startRef": c.get("chunk_start_reference", ""),
                               "endRef": c.get("chunk_end_reference", "")}
                              for c in corrected]})

# --- W1-W3 page-boundary inference ---
for i in range(15):
    full = markdown_doc(rng.randint(6, 16), with_tags=True)
    ncuts = min(rng.randint(1, 5), max(1, len(full) - 1))
    cuts = sorted(rng.sample(range(1, len(full)), ncuts))
    bounds = [0] + cuts + [len(full)]
    secs = []
    for j in range(len(bounds) - 1):
        secs.append({"section_number": j + 1,
                     "content": full[bounds[j]:bounds[j + 1]],
                     "section_start_page": rng.choice([None, None, j + 1]),
                     "section_end_page": rng.choice([None, None, j + 2])})
    inp = [dict(x) for x in secs]
    inferred = s02.infer_page_boundaries([dict(x) for x in secs], full)
    out.append({"kind": "inference", "full": full, "input": inp,
                "inferred": [{"number": x["section_number"],
                              "start": x.get("section_start_page"),
                              "end": x.get("section_end_page"),
                              "count": x.get("section_page_count", 0)}
                             for x in inferred]})

# --- W12 hierarchy strings ---
for i in range(10):
    n = rng.randint(2, 9)
    secs = [{"level": rng.choice([1, 2, 3, 4]), "title": words(2).title()}
            for _ in range(n)]
    out.append({"kind": "hierarchy", "sections": secs,
                "strings": [s02.generate_hierarchy_string(secs[j], secs, j)
                            for j in range(n)]})

# --- T9/T10 natural sectioning + force split ---
for i in range(20):
    if i % 4 == 0:
        page = sentencey(rng.randint(1, 12))        # prose only
    elif i % 4 == 1:
        page = markdown_doc(rng.randint(2, 8))      # mixed blocks
    elif i % 4 == 2:
        page = words(rng.randint(3, 40))            # no sentence ends
    else:
        page = sentencey(1)                          # single short sentence
    secs = cs3.split_page_into_sections(page)
    out.append({"kind": "naturalSplit", "page": page,
                "sections": [{"sid": sid, "text": t} for sid, t in secs]})

# --- L1/L2/L3/L4/L5/L8 prompt builders + retry machinery ---
# (appended after all prior loops so the seeded rng keeps earlier cases
# byte-stable)
if not hasattr(sys.modules['openai'], 'APIError'):
    sys.modules['openai'].APIError = type('APIError', (Exception,), {})
for _name in ['fitz', 'PIL']:
    sys.modules.setdefault(_name, types.ModuleType(_name))
if not hasattr(sys.modules['PIL'], 'Image'):
    sys.modules['PIL'].Image = types.ModuleType('PIL.Image')
s01 = load('s01', BASE + 'stage_01_chapter_processing.py')
sab3 = load('sab3', '/root/reference/catalog search - sab99/stage3_generate_summaries.py')
vis = load('vis', '/root/reference/catalog search - vision/stage2_process_vision.py')

# L2 chapter prompt: initial / continue / final variants
for i in range(12):
    seg = sentencey(rng.randint(2, 30))
    prev = None if i % 3 == 0 else words(rng.randint(10, 40))
    fin = (i % 2 == 0)
    msgs = s01.build_chapter_analysis_prompt(seg, prev, fin)
    out.append({"kind": "chapterPrompt", "segment": seg, "prev": prev,
                "final": fin, "messages": msgs})

# L3 section prompt: 0..8 previous summaries (checks the [-5:] window)
for i in range(12):
    prevs = [words(rng.randint(8, 20)) for _ in range(rng.randint(0, 8))]
    content = sentencey(rng.randint(2, 20))
    ch = words(rng.randint(10, 30))
    hier = " > ".join(["Chapter " + words(2).title(), f"Section {i}"])
    msgs = s02.build_section_analysis_prompt(
        {"content": content, "title": f"T{i}"}, ch, hier, prevs)
    out.append({"kind": "sectionPrompt", "content": content,
                "chapter_summary": ch, "hierarchy": hier, "previous": prevs,
                "messages": msgs})

# L4/L5 catalog + sab99 formatted system prompts (incl. literal-brace text)
for i in range(8):
    md = markdown_doc(rng.randint(2, 8), with_tags=(i % 2 == 0))
    dl = rng.choice(["concise", "standard", "detailed"])
    src = rng.choice(["internal_cheatsheets", "financial_reports",
                      "internal_sab_99"])
    fn = f"doc {i} (v{i % 3}).pdf"
    out.append({
        "kind": "catalogPrompt", "md": md, "detail": dl, "source": src,
        "filename": fn,
        "catalog": cs3.SYSTEM_PROMPT_TEMPLATE.format(
            markdown_content=md, detail_level=dl, document_source=src,
            filename=fn),
        "sab99": sab3.SYSTEM_PROMPT_TEMPLATE.format(
            markdown_content=md, detail_level=dl, document_source=src,
            filename=fn)})

# Tool schemas (compared as parsed JSON, order-insensitive)
out.append({"kind": "toolSchemas",
            "chapter": s01.CHAPTER_TOOL_SCHEMA,
            "section": s02.SECTION_TOOL_SCHEMA,
            "catalog": cs3.GPT_TOOL_DEFINITION,
            "sab99": sab3.GPT_TOOL_DEFINITION})

# L8 vision: the six fixed passes + synthesis message assembly, captured by
# RUNNING synthesize_vision_to_markdown with a scripted client
out.append({"kind": "visionPasses",
            "passes": [{"name": k, "prompt": v}
                       for k, v in vis.VISION_PROMPTS.items()]})

class _Create:
    def __init__(self, rec, reply):
        self.rec, self.reply = rec, reply
    def create(self, **kw):
        self.rec.append(kw)
        r = self.reply
        if isinstance(r, Exception):
            raise r
        return r

def _resp(content=None, tool_calls=None, pt=100, ct=20):
    msg = types.SimpleNamespace(content=content, tool_calls=tool_calls)
    usage = types.SimpleNamespace(prompt_tokens=pt, completion_tokens=ct,
                                  total_tokens=pt + ct)
    return types.SimpleNamespace(
        choices=[types.SimpleNamespace(message=msg)], usage=usage)

def _tc(name, args):
    fn = types.SimpleNamespace(name=name, arguments=args)
    return types.SimpleNamespace(function=fn)

for i in range(4):
    pvd = {k: words(rng.randint(5, 25)) for k in vis.VISION_PROMPTS}
    page_no = rng.randint(1, 40)
    calls = []
    reply = _resp(content=words(12))
    fake_client_cls = (lambda rec, rep: (lambda **kw:
        types.SimpleNamespace(chat=types.SimpleNamespace(
            completions=_Create(rec, rep)))))(calls, reply)
    vis.OpenAI = fake_client_cls
    vis._cached_oauth_token = "tok"
    vis._token_expiry_time = 10 ** 12
    got = vis.synthesize_vision_to_markdown(pvd, page_no)
    assert calls, "vision synthesis made no call"
    out.append({"kind": "visionSynth", "page": page_no,
                "passes": [{"name": k, "result": v} for k, v in pvd.items()],
                "messages": calls[0]["messages"]})

# L1 retry machine: scripted outcome sequences against the reference's
# call_gpt_with_tool_enforcement, recording per-attempt messages + sleeps
_sleeps = []
s01.time.sleep = lambda s: _sleeps.append(s)

class _ScriptedCompletions:
    def __init__(self, script, rec):
        self.script, self.rec, self.i = script, rec, 0
    def create(self, **kw):
        self.rec.append(kw["messages"])
        step = self.script[min(self.i, len(self.script) - 1)]
        self.i += 1
        if step == "api_error":
            raise s01.APIError("boom")
        if step == "no_tool":
            return _resp(content="plain text")
        if step == "wrong_tool":
            return _resp(tool_calls=[_tc("other_tool", "{}")])
        if step == "bad_json":
            return _resp(tool_calls=[_tc("provide_chapter_analysis", "{not json")])
        if step == "empty_summary":
            return _resp(tool_calls=[_tc("provide_chapter_analysis",
                                         json.dumps({"summary": ""}))])
        if step == "good":
            return _resp(tool_calls=[_tc("provide_chapter_analysis",
                                         json.dumps({"summary": "A fine summary."}))])
        raise AssertionError(step)

SCRIPTS = [
    ["good"],
    ["no_tool", "good"],
    ["wrong_tool", "bad_json", "good"],
    ["empty_summary", "empty_summary", "good"],
    ["api_error", "good"],
    ["api_error", "api_error", "api_error", "good"],
    ["no_tool", "api_error", "no_tool", "api_error", "good"],
    ["no_tool", "no_tool", "no_tool", "no_tool", "no_tool"],
    ["api_error", "api_error", "api_error", "api_error", "api_error"],
]
base_msgs = s01.build_chapter_analysis_prompt(sentencey(4), words(20), False)
for script in SCRIPTS:
    _sleeps.clear()
    rec = []
    client = types.SimpleNamespace(chat=types.SimpleNamespace(
        completions=_ScriptedCompletions(script, rec)))
    args, usage = s01.call_gpt_with_tool_enforcement(
        client, "m", [dict(m) for m in base_msgs], 100, 0.2,
        s01.CHAPTER_TOOL_SCHEMA)
    out.append({"kind": "retryTrace", "script": script,
                "base_messages": base_msgs,
                "attempt_messages": rec, "sleeps": list(_sleeps),
                "result": args})

# --- T3 + G8: chapter segmentation + rolling fold, by RUNNING the
# reference's get_chapter_summary_robust with a scripted client and a
# shrunken token budget (limit 3000, buffer 2000 -> available 1000) ---
_s01_limit = s01.GPT_INPUT_TOKEN_LIMIT
s01.GPT_INPUT_TOKEN_LIMIT = 3000

class _FoldCompletions:
    def __init__(self, rec, tool, field, prefix):
        self.rec, self.tool, self.field, self.prefix = rec, tool, field, prefix
        self.i = 0
    def create(self, **kw):
        self.rec.append(kw["messages"])
        self.i += 1
        return _resp(tool_calls=[_tc(self.tool,
            json.dumps({self.field: f"{self.prefix} {self.i}"}))])

def _between(s, a, b):
    i = s.index(a) + len(a)
    return s[i:s.index(b, i)]

for i in range(8):
    n_sent = rng.choice([12, 80, 250, 500])
    text = sentencey(n_sent)
    rec = []
    client = types.SimpleNamespace(chat=types.SimpleNamespace(
        completions=_FoldCompletions(rec, "provide_chapter_analysis",
                                     "summary", "SUMMARY")))
    result = s01.get_chapter_summary_robust(text, client, "m")
    out.append({"kind": "chapterFold", "text": text,
                "segments": [_between(m[-1]["content"],
                                      "<current_segment>\n",
                                      "\n</current_segment>") for m in rec],
                "messages": rec, "result": result})
s01.GPT_INPUT_TOKEN_LIMIT = _s01_limit

# --- T4 + G9 segment fold: stage_02 process_section_summary with budget
# limit 5000 (available = 5000 - 2000 - 2000 = 1000) ---
_s02_limit = s02.GPT_INPUT_TOKEN_LIMIT
s02.GPT_INPUT_TOKEN_LIMIT = 5000
for i in range(8):
    n_sent = rng.choice([12, 80, 250, 500])
    content = sentencey(n_sent)
    prevs = [words(rng.randint(6, 14)) for _ in range(rng.randint(0, 3))]
    ch = words(rng.randint(8, 20))
    hier = "Ch > S" + str(i)
    section = {"content": content, "token_count": s02.count_tokens(content),
               "title": f"T{i}", "section_number": i + 1}
    rec = []
    client = types.SimpleNamespace(chat=types.SimpleNamespace(
        completions=_FoldCompletions(rec, "provide_section_analysis",
                                     "section_summary", "SSUM")))
    result = s02.process_section_summary(section, {"chapter_summary": ch},
                                         hier, list(prevs), client)
    out.append({"kind": "sectionFold", "content": content,
                "chapter_summary": ch, "hierarchy": hier, "previous": prevs,
                "segments": [_between(m[-1]["content"],
                                      "<current_section>\n",
                                      "\n</current_section>") for m in rec],
                "messages": rec, "result": result})
s02.GPT_INPUT_TOKEN_LIMIT = _s02_limit

path = "src/test/resources/reference_golden.jsonl"
import os
os.makedirs(os.path.dirname(path), exist_ok=True)
with open(path, "w") as f:
    for case in out:
        f.write(json.dumps(case, ensure_ascii=False) + "\n")
print(f"wrote {len(out)} cases to {path}")
