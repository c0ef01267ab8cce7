#!/usr/bin/env python3
"""Extract the reference's prompt TEMPLATES (pure data, not code) into
src/main/resources/graft/prompts/ for the Scala engine to load at runtime.

The templates are the reference system's user-visible prompt *content*
(catalog search/stage3_generate_summaries.py:115, catalog search - sab99/
stage3_generate_summaries.py:110, catalog search - vision/
stage2_process_vision.py:130) — reproducing them byte-for-byte is the
semantics; PromptParitySpec asserts the Scala assembly around them matches
the reference builders exactly. Extraction is mechanical (module attribute
read) to avoid transcription errors.

Usage: python3 tools/extract_reference_prompts.py
"""
import importlib.util, json, sys, types, os

def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m

for _name in ['smb', 'smb.SMBConnection', 'smb.smb_structs', 'openai',
              'requests', 'tqdm', 'fitz', 'PIL']:
    sys.modules.setdefault(_name, types.ModuleType(_name))
sys.modules['smb'].smb_structs = sys.modules['smb.smb_structs']
sys.modules['smb.SMBConnection'].SMBConnection = object
sys.modules['PIL'].Image = types.ModuleType('PIL.Image')
if not hasattr(sys.modules['openai'], 'OpenAI'):
    sys.modules['openai'].OpenAI = object
if not hasattr(sys.modules['openai'], 'APIError'):
    sys.modules['openai'].APIError = type('APIError', (Exception,), {})

REF = '/root/reference/'
cs3 = load('x_cs3', REF + 'catalog search/stage3_generate_summaries.py')
sab3 = load('x_sab3', REF + 'catalog search - sab99/stage3_generate_summaries.py')
vis = load('x_vis', REF + 'catalog search - vision/stage2_process_vision.py')
s01 = load('x_s01', REF + 'semantic search/stage_01_chapter_processing.py')
s02 = load('x_s02', REF + 'semantic search/stage_02_section_processing.py')

OUT = os.path.join(os.path.dirname(__file__), '..',
                   'src/main/resources/graft/prompts')
os.makedirs(OUT, exist_ok=True)

def write(name, text):
    with open(os.path.join(OUT, name), 'w', encoding='utf-8') as f:
        f.write(text)
    print(f"wrote {name} ({len(text)} chars)")

# Raw python-format templates ({{ }} escapes preserved; Scala side applies
# python .format semantics).
write('catalog_system.txt', cs3.SYSTEM_PROMPT_TEMPLATE)
write('sab99_system.txt', sab3.SYSTEM_PROMPT_TEMPLATE)
write('vision_prompts.json',
      json.dumps(vis.VISION_PROMPTS, indent=2, ensure_ascii=False))
write('chapter_tool.json',
      json.dumps(s01.CHAPTER_TOOL_SCHEMA, indent=2, ensure_ascii=False))
write('section_tool.json',
      json.dumps(s02.SECTION_TOOL_SCHEMA, indent=2, ensure_ascii=False))
write('catalog_tool.json',
      json.dumps(cs3.GPT_TOOL_DEFINITION, indent=2, ensure_ascii=False))
write('sab99_tool.json',
      json.dumps(sab3.GPT_TOOL_DEFINITION, indent=2, ensure_ascii=False))
