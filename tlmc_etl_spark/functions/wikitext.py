"""Wiki-markup structured parsing: bracket-aware splitting, template
parameter extraction, and the lyrics page UDTF.

Re-derived semantics of the reference's ExternalInfo enrichment parsers —
the engine's counterpart of:
 - strict_split (original_track_discovery.py:32-47): split only at
   bracket depth 0;
 - bracket_split (original_track_map.py:46-72): a string decomposes into
   top-level bracketed segments, whitespace outside brackets is dropped,
   any other stray character outside brackets invalidates the segment,
   and an HTML comment (`<!--...-->`) yields nothing;
 - `{{template|n|index}}` param extraction
   (original_track_map.py:43,75-97): template name + trailing index, the
   middle param must be digits; the index is pipe-stripped, and lookups
   trim LEADING zeros (original_track_map.py:209-211);
 - the lyrics page parser (lyrics_scraper.py:174-308): optional
   <tabber> sections split on `|-|` lines with `Title=` headers, then a
   line machine over time= / sep= / lang= lines with section terminators
   (`--`, `==`, `__`), implicit section opening on time=, synthesized
   `<line-N>` groups for untimed lines (a repeated language starts a new
   group), and same-language lines under one timestamp concatenating with
   a newline instead of overwriting.

All parsers are pure Python (they run inside Arrow-batched UDFs over
pre-built text columns); no scraping/HTTP — the reference's fetch layer
is out-of-engine by design (SURVEY.md §2.1).
"""

from __future__ import annotations

import pandas as pd

import re
from typing import Optional

_BRACKETS = {"(": ")", "{": "}", "[": "]"}
_TEMPLATE_RE = re.compile(r"\{\{(.+)\|(\d+)\|(.+)\}\}")
_LYRIC_TERMINATORS = ("--", "==", "__")


def strict_split(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` only at bracket depth 0 (unbalanced closers pop an
    empty stack harmlessly, matching the reference's tolerance)."""
    stack: list[str] = []
    parts: list[str] = []
    part = ""
    for c in s:
        if c in _BRACKETS:
            stack.append(c)
        elif c in _BRACKETS.values():
            if stack:
                stack.pop()
        elif c == sep and not stack:
            parts.append(part)
            part = ""
            continue
        part += c
    parts.append(part)
    return parts


def bracket_split(s: str, fail_on_char: bool = True) -> Optional[list[str]]:
    """Decompose into top-level bracketed segments; None = invalid.

    Returns [] for an HTML comment, None when `fail_on_char` and a
    non-space character sits outside every bracket (the caller skips that
    segment, not the run — the reference's malformed-segment policy).
    """
    s = s.strip()
    if s.startswith("<!--") and s.endswith("-->"):
        return []
    stack: list[str] = []
    out: list[str] = []
    current = ""
    for c in s:
        if c in _BRACKETS:
            if current and not stack:
                out.append(current)
                current = ""
            stack.append(c)
            current += c
            continue
        if stack and c == _BRACKETS[stack[-1]]:
            stack.pop()
            current += c
            continue
        if fail_on_char and not stack and c.strip():
            return None
        current += c.strip()
    if current:
        out.append(current)
    return out


def template_refs(
    text: str,
    aliases: Optional[dict[str, str]] = None,
    exclusions: Optional[set[str]] = None,
) -> list[tuple[str, int, str]]:
    """All `{{template|n|index}}` references in a comma-joined original
    string: strict-split at depth 0, bracket-split each part (malformed
    parts drop silently), regex-extract each segment. Output (template,
    ordinal, index) with the alias fold applied and exclusions dropped;
    the index is pipe-stripped (the reference's query param shape)."""
    refs: list[tuple[str, int, str]] = []
    for part in strict_split(text):
        part = part.strip().replace("\n", "")
        if not part or "原曲段落" in part:
            continue
        segments = bracket_split(part)
        if not segments:
            continue
        for seg in segments:
            m = _TEMPLATE_RE.match(seg)
            if not m:
                continue
            name, ordinal, idx = m.group(1), int(m.group(2)), m.group(3).strip("|")
            if aliases:
                name = aliases.get(name, name)
            if exclusions and name in exclusions:
                continue
            refs.append((name, ordinal, idx))
    return refs


def normalize_track_index(idx: str) -> str:
    """Lookup normalization: trim LEADING zeros only
    (original_track_map.py:209-211)."""
    return idx.lstrip("0")


def _parse_lyrics_section(src: str, section: Optional[str]) -> list[tuple]:
    """The reference line machine (lyrics_scraper.py:204-308). Returns
    (section, ti_index, timestamp, lang, text) rows in encounter order."""
    in_section = False
    current: Optional[str] = None
    synthesized = False
    default_n = 0
    order: list[str] = []
    lyrics: dict[str, dict[str, str]] = {}

    for line in src.split("\n"):
        if not line.strip():
            continue
        if not line.strip("x"):
            continue
        if any(line.startswith(t) for t in _LYRIC_TERMINATORS):
            in_section = False
            current = None
            continue
        squeezed = line.replace(" ", "")
        if squeezed.startswith("lyrics="):
            in_section = not in_section
            continue
        if not in_section:
            if squeezed.startswith("time="):
                in_section = True  # zh-community pages never write lyrics=
            else:
                continue
        if squeezed.startswith("time="):
            current = squeezed.split("=")[1].strip()
            if not current:
                current = f"<line-{default_n}>"
                default_n += 1
            synthesized = False
            if current not in lyrics:
                lyrics[current] = {}
                order.append(current)
            continue
        if squeezed.startswith("sep="):
            sep_ts = squeezed.split("=")[1].strip()
            if sep_ts not in lyrics:
                order.append(sep_ts)
            lyrics[sep_ts] = {}
            current = None
            synthesized = False
            continue
        try:
            lang, text = line.split("=", 1)
        except ValueError:
            if line.strip().startswith("}}"):
                current = None
                in_section = False
            continue
        lang = lang.strip().lower()
        if current is None or (synthesized and lang in lyrics[current]):
            current = f"<line-{default_n}>"
            default_n += 1
            synthesized = True
            lyrics[current] = {}
            order.append(current)
        if lang in lyrics[current]:
            lyrics[current][lang] += "\n" + text.strip()
        else:
            lyrics[current][lang] = text.strip()

    rows = []
    for i, ts in enumerate(order):
        for lang, text in lyrics[ts].items():
            rows.append((section, i, ts, lang, text))
    return rows


def template_refs_udf():
    """Spark UDF: text → array<struct<template,ordinal,track_ref>>."""
    from pyspark.sql import functions as F

    def go(text):
        if text is None:
            return []
        return template_refs(text)

    return F.udf(go, "array<struct<template string, ordinal int, track_ref string>>")


def template_refs_pandas_udf():
    """Arrow-batched template_refs: one Python call per Arrow batch, the
    form the corpus-scale paths use (wiki_template_explode,
    lyrics_heal_join's refusal gate). The parse itself is unchanged —
    only the per-row invoke/pickle overhead is amortized, which is what
    dominates when the wiki/lyrics corpus (rows ∝ pages, not albums)
    is the input. Scalar template_refs_udf stays for small columns."""
    from pyspark.sql import functions as F

    def go_batch(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: [] if t is None else template_refs(t))

    return F.pandas_udf(
        go_batch, "array<struct<template string, ordinal int, track_ref string>>"
    )


def lyrics_rows_udf():
    """Spark UDF: page source → array<struct<section,ti_index,ts,lang,text>>."""
    from pyspark.sql import functions as F

    return F.udf(
        parse_lyrics_page,
        "array<struct<section string, ti_index int, ts string, lang string, text string>>",
    )


def parse_lyrics_page(src: str) -> list[tuple]:
    """Full page → (section, ti_index, timestamp, lang, text) rows.

    A single <tabber> block splits into sections on `|-|` lines, each
    headed by `Title=` (lyrics_scraper.py:174-202); pages without one
    parse as a single NULL-titled section."""
    if src is None:
        return []
    m = re.search(r"<tabber>(.*?)</tabber>", src, flags=re.DOTALL)
    if not m:
        return _parse_lyrics_section(src, None)
    lines = [ln for ln in m.group(1).split("\n") if ln]
    cuts = [i for i, ln in enumerate(lines) if ln == "|-|"]
    bounds = [0] + cuts + [len(lines)]
    rows: list[tuple] = []
    for i in range(len(bounds) - 1):
        segment = [ln for ln in lines[bounds[i] : bounds[i + 1]] if ln != "|-|"]
        if not segment:
            continue
        title = segment[0].split("=")[0].strip()
        rows.extend(_parse_lyrics_section("\n".join(segment), title))
    return rows


# ---------------------------------------------------------------------------
# Spark 4 native UDTF form
# ---------------------------------------------------------------------------

from pyspark.sql.functions import udtf as _udtf  # noqa: E402


@_udtf(returnType="idx int, kind string, content string")
class BracketSpansUDTF:
    """One row per delimited span of the input, in positional order:
    `[x]` -> ('square', x), `(x)` -> ('round', x), and any bare text
    between spans -> ('plain', trimmed). The table-function form of the
    bracket scanning the catalog's filename parsers do with scalar UDFs
    (functions/text.py; info_scanner_ph2.py:73-103) — as a NATIVE Python
    UDTF, so SQL consumers use it in a LATERAL join instead of
    explode(udf(...)). Non-nesting by contract (filenames don't nest)."""

    def eval(self, s: str):
        if s is None:
            return
        idx = 0
        i = 0
        plain: list[str] = []
        closers = {"[": ("]", "square"), "(": (")", "round")}
        while i < len(s):
            ch = s[i]
            if ch in closers:
                close, kind = closers[ch]
                end = s.find(close, i + 1)
                if end < 0:
                    plain.append(s[i:])
                    break
                text = "".join(plain).strip()
                if text:
                    yield idx, "plain", text
                    idx += 1
                plain = []
                yield idx, kind, s[i + 1 : end]
                idx += 1
                i = end + 1
            else:
                plain.append(ch)
                i += 1
        text = "".join(plain).strip()
        if text:
            yield idx, "plain", text
