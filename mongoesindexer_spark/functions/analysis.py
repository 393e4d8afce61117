"""Text-analysis kernel: the reference's Elasticsearch analyzer chains, native.

The reference configures (but never implements) these analyzers; ES/Lucene
executes them.  We implement them as pure Python functions so they can be
golden-tested standalone and wrapped in Arrow-vectorized pandas UDFs for
Spark (no per-row Python UDFs in query plans).

Reference analyzer specs (all in /root/reference/configs/):

* ``autocomplete_analyzer`` (index-side text analyzer)
  - ltd_doc.settings.json / cld_doc.config.json / cld_lf_unifield.settings.json:
    ``whitespace`` tokenizer → ``lowercase`` → ``word_delimiter``
    (catenate_words, catenate_numbers, catenate_all, preserve_original)
  - keyword.settings.json / ltdkeyword.settings.json / node.settings.json /
    user.setting.json: same + ``edge_ngram`` (min 1, max 100;
    keyword min 1; ltd_doc defines min 2/max 30 but does not wire it).
* ``autosearch`` (search-side analyzer — asymmetric, no edge-ngrams)
  - ltd_doc/cld_doc/cld_lf: ``whitespace`` → ``lowercase``
  - keyword/ltdkeyword/node/user: ``whitespace`` → ``lowercase`` →
    ``word_delimiter``
* ``normalize`` (keyword normalizer): ``keyword`` tokenizer → ``lowercase``
  → ``asciifolding`` (ltd_doc.settings.json:278-285).
* ``english_stop_words`` (``stop`` filter, ``_english_``, ignore_case) —
  declared in cld_doc.config.json:158-162 but not wired into an analyzer;
  available here as :func:`stop_filter`.

Where Lucene semantics are ambiguous or unobservable in this sandbox, the
behaviour below is THE engine spec, pinned by golden tests
(tests/test_analysis.py) both standalone and under Spark.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

# Lucene's classic English stop set (public: org.apache.lucene.analysis.en
# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET).
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------


def whitespace_tokenize(text: str) -> list[str]:
    """ES ``whitespace`` tokenizer: split on Unicode whitespace only."""
    return text.split()


# ---------------------------------------------------------------------------
# Token filters
# ---------------------------------------------------------------------------


def lowercase(tokens: list[str]) -> list[str]:
    """ES ``lowercase`` filter (Unicode lowercase)."""
    return [t.lower() for t in tokens]


def asciifolding(text: str) -> str:
    """ES ``asciifolding``: strip diacritics (NFKD, drop combining marks)."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", text) if not unicodedata.combining(c)
    )


_WD_RUN = re.compile(r"[^\W_]+", re.UNICODE)  # alnum runs (underscore delimits)


def _subword_parts(token: str) -> list[str]:
    """Split a token into word_delimiter subword parts.

    Split points (Lucene WordDelimiterGraphFilter defaults):
    non-alphanumeric chars (incl. ``_``), letter↔digit transitions, and
    lower→Upper case transitions.  A trailing English possessive ``'s`` is
    stemmed first (``stem_english_possessive`` default true).
    """
    if token.endswith(("'s", "'S", "’s", "’S")):
        token = token[:-2]
    parts: list[str] = []
    for run in _WD_RUN.findall(token):
        i = 0
        n = len(run)
        while i < n:
            ch = run[i]
            j = i + 1
            if ch.isdigit():
                while j < n and run[j].isdigit():
                    j += 1
            else:
                # letter run; break on digit or lower→Upper transition
                while j < n and run[j].isalpha():
                    if run[j].isupper() and run[j - 1].islower():
                        break
                    j += 1
            parts.append(run[i:j])
            i = j
    return parts


def word_delimiter(
    tokens: list[str],
    *,
    catenate_words: bool = True,
    catenate_numbers: bool = True,
    catenate_all: bool = True,
    preserve_original: bool = True,
) -> list[str]:
    """ES ``word_delimiter`` filter with the reference's exact flags.

    Reference config (identical in all 7 configs, e.g.
    ltd_doc.settings.json ``wordsdelimeter``)::

        {"type": "word_delimiter", "catenate_words": true,
         "catenate_numbers": true, "catenate_all": true,
         "preserve_original": true}

    Engine spec (pinned by golden tests):
    * a token with no alphanumeric content emits nothing;
    * a token that is a single part equal to itself emits just itself;
    * otherwise emit, deduplicated preserving first occurrence:
      original (preserve_original), each subword part, catenation of
      letter parts (catenate_words, when >1 letter part), catenation of
      digit parts (catenate_numbers, when >1 digit part), catenation of
      all parts (catenate_all, when >1 part).
    """
    out: list[str] = []
    for token in tokens:
        parts = _subword_parts(token)
        if not parts:
            continue
        if len(parts) == 1 and parts[0] == token:
            out.append(token)
            continue
        emitted: list[str] = []
        if preserve_original:
            emitted.append(token)
        emitted.extend(parts)
        alpha = [p for p in parts if not p[0].isdigit()]
        digit = [p for p in parts if p[0].isdigit()]
        if catenate_words and len(alpha) > 1:
            emitted.append("".join(alpha))
        if catenate_numbers and len(digit) > 1:
            emitted.append("".join(digit))
        if catenate_all and len(parts) > 1:
            emitted.append("".join(parts))
        seen: set[str] = set()
        for t in emitted:
            if t not in seen:
                seen.add(t)
                out.append(t)
    return out


def edge_ngram(tokens: list[str], min_gram: int, max_gram: int) -> list[str]:
    """ES ``edge_ngram`` token filter: prefixes of each token.

    Emits prefixes of length ``min_gram..min(len, max_gram)``; tokens
    shorter than ``min_gram`` emit nothing.
    """
    out: list[str] = []
    for t in tokens:
        top = min(len(t), max_gram)
        for k in range(min_gram, top + 1):
            out.append(t[:k])
    return out


def synonym_filter(tokens: list[str],
                   groups: tuple[tuple[str, ...], ...]) -> list[str]:
    """ES ``synonym`` token filter, index-time expansion form: a token
    belonging to an equivalence group emits EVERY group member (itself
    first, then the others in group order) — Lucene emits the expansion
    tokens at positionIncrement 0, so in the positional chain all
    members share the source token's position and phrase queries match
    through either synonym.  Single-token synonyms only (each group
    member is one analyzed token) — the multi-word synonym graph is out
    of scope, documented."""
    if not groups:
        return tokens
    m = _synonym_map(groups)
    out: list[str] = []
    for t in tokens:
        g = m.get(t)
        if g is None:
            out.append(t)
        else:
            out.append(t)
            out.extend(s for s in g if s != t)
    return out


_SYN_MAPS: dict[tuple[tuple[str, ...], ...], dict] = {}


def _synonym_map(groups) -> dict:
    m = _SYN_MAPS.get(groups)
    if m is None:
        m = {}
        for g in groups:
            # members fold to lowercase: the token stream is lowercased
            # before any filter runs, so a mixed-case config member would
            # otherwise never match (and would emit unsearchable terms)
            lg = tuple(dict.fromkeys(t.lower() for t in g))
            for t in lg:
                m[t] = lg
        _SYN_MAPS[groups] = m
    return m


def stop_filter(tokens: list[str], stopwords: frozenset[str] = ENGLISH_STOPWORDS) -> list[str]:
    """ES ``stop`` filter (``_english_``, ignore_case: true)."""
    return [t for t in tokens if t.lower() not in stopwords]


# ---------------------------------------------------------------------------
# Analyzers (filter chains, per reference configs)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AnalyzerConfig:
    """One (collection → index) analyzer family, as in configs/*.json."""

    name: str = "ltd_docs"
    # edge_ngram wired into autocomplete/autosearch (keyword/node/user
    # family). ltd_doc/cld_doc define the filter but don't wire it.
    use_edge_ngram: bool = False
    min_gram: int = 1
    max_gram: int = 100
    # autosearch includes word_delimiter in the keyword/node/user family.
    search_word_delimiter: bool = False
    use_stopwords: bool = False
    stopwords: frozenset[str] = field(default=ENGLISH_STOPWORDS)
    # index-time synonym expansion groups (single-token members; applied
    # after word_delimiter, before stop/edge_ngram — see synonym_filter)
    synonyms: tuple[tuple[str, ...], ...] = ()


#: ltd_doc.settings.json family — the main document index (the one whose
#: shape matches the web-pages input).  Index: ws→lower→WDF;
#: search: ws→lower.
LTD_DOC = AnalyzerConfig(name="ltd_docs")

#: keyword.settings.json family — prefix-search indexes.
#: Index: ws→lower→WDF→edge_ngram(1,100); search: ws→lower→WDF.
KEYWORD = AnalyzerConfig(
    name="keywords", use_edge_ngram=True, min_gram=1, max_gram=100,
    search_word_delimiter=True,
)


# Every filter in both chains is per-token, so a whole chain is a pure
# function of (analyzer, lowercased token) — memoized below.  Web text is
# Zipf-distributed, so on a real corpus nearly every token is a cache hit;
# this turns the hot tokenize path into split + dict lookups and is the
# single biggest index-build CPU win.  Deterministic by construction (the
# cache only memoizes a pure function).
_TOKEN_CACHE: dict[tuple[str, str], tuple[str, ...]] = {}
_TOKEN_CACHE_MAX = 1_000_000

# Cache namespaces are interned per *full* config value, not per cfg.name:
# two AnalyzerConfigs sharing a name but differing in flags (stopwords on/
# off, ngram bounds) must not share cache entries — keying on name alone
# would silently serve one config's tokenization to the other.  Equal
# configs intern to the same namespace (frozen dataclass ⇒ value hash), so
# cache reuse across equal instances is preserved; the dict lookup hashes
# the config once per analyze call, keeping the per-token loop string-keyed.
_CFG_NS: dict[AnalyzerConfig, str] = {}
_CFG_NS_LOCK = __import__("threading").Lock()


def _cfg_namespace(cfg: AnalyzerConfig) -> str:
    ns = _CFG_NS.get(cfg)  # lock-free fast path (dict reads are atomic)
    if ns is None:
        # interning must be serialized: two driver threads racing on
        # different configs could otherwise both read len()==0 and mint
        # the SAME "#0" namespace — recreating the cross-config cache
        # poisoning this function exists to prevent
        with _CFG_NS_LOCK:
            ns = _CFG_NS.get(cfg)
            if ns is None:
                ns = f"{cfg.name}#{len(_CFG_NS)}"
                _CFG_NS[cfg] = ns
    return ns


def _analyze_index_token(t: str, cfg: AnalyzerConfig) -> tuple[str, ...]:
    tokens = word_delimiter([t])
    if cfg.synonyms:
        tokens = synonym_filter(tokens, cfg.synonyms)
    if cfg.use_stopwords:
        tokens = stop_filter(tokens, cfg.stopwords)
    if cfg.use_edge_ngram:
        tokens = edge_ngram(tokens, cfg.min_gram, cfg.max_gram)
    return tuple(tokens)


def analyze_index(text: str, cfg: AnalyzerConfig = LTD_DOC) -> list[str]:
    """Index-side ``autocomplete_analyzer`` chain."""
    out: list[str] = []
    cache = _TOKEN_CACHE
    name = "i:" + _cfg_namespace(cfg)
    for raw in text.split():
        t = raw.lower()
        key = (name, t)
        e = cache.get(key)
        if e is None:
            e = _analyze_index_token(t, cfg)
            if len(cache) < _TOKEN_CACHE_MAX:
                cache[key] = e
        out.extend(e)
    return out


def analyze_index_pos(text: str, cfg: AnalyzerConfig = LTD_DOC
                      ) -> tuple[list[str], list[int]]:
    """Index-side chain WITH token positions (ES ``index_options:
    positions`` — the Lucene default for text fields, which every
    reference mapping inherits).

    Position = the 0-based index of the emitted token's ORIGINATING
    whitespace token: word_delimiter parts/catenations and edge-ngrams
    all share their source token's position (Lucene emits expansion
    tokens at positionIncrement 0), and a stop-filtered token emits
    nothing at its index, leaving a gap (the positionIncrement analog) —
    so phrase matching treats removed stopwords as holes, never as
    adjacency.  Token stream is identical to :func:`analyze_index`
    (property-tested); the shared memo cache serves both.
    """
    toks: list[str] = []
    poss: list[int] = []
    cache = _TOKEN_CACHE
    name = "i:" + _cfg_namespace(cfg)
    for i, raw in enumerate(text.split()):
        t = raw.lower()
        key = (name, t)
        e = cache.get(key)
        if e is None:
            e = _analyze_index_token(t, cfg)
            if len(cache) < _TOKEN_CACHE_MAX:
                cache[key] = e
        toks.extend(e)
        poss.extend([i] * len(e))
    return toks, poss


def _analyze_search_token(t: str, cfg: AnalyzerConfig) -> tuple[str, ...]:
    tokens = [t]
    if cfg.search_word_delimiter:
        tokens = word_delimiter(tokens)
    if cfg.use_stopwords:
        tokens = stop_filter(tokens, cfg.stopwords)
    return tuple(tokens)


def analyze_search(text: str, cfg: AnalyzerConfig = LTD_DOC) -> list[str]:
    """Search-side ``autosearch`` chain (asymmetric: no edge-ngrams)."""
    out: list[str] = []
    cache = _TOKEN_CACHE
    name = "s:" + _cfg_namespace(cfg)
    for raw in text.split():
        t = raw.lower()
        key = (name, t)
        e = cache.get(key)
        if e is None:
            e = _analyze_search_token(t, cfg)
            if len(cache) < _TOKEN_CACHE_MAX:
                cache[key] = e
        out.extend(e)
    return out


def normalize(value: str) -> str:
    """``normalize`` analyzer: keyword tokenizer → lowercase → asciifolding.

    Whole-value single token (ltd_doc.settings.json:278-285); used for
    exact-match / sort keys on text fields.
    """
    return asciifolding(value.lower())


# ---------------------------------------------------------------------------
# HTML → text extraction (input_hint: byte-identical per url)
# ---------------------------------------------------------------------------

_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TITLE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_BODY = re.compile(r"<body\b[^>]*>(.*?)</body\s*>", re.IGNORECASE | re.DOTALL)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")


def _clean_fragment(fragment: str) -> str:
    return _WS.sub(" ", _TAG.sub(" ", fragment)).strip()


def extract_text(html: bytes | str | None) -> str | None:
    """Deterministic html→text extraction (engine spec, golden-tested).

    Spec: drop ``<script>``/``<style>`` blocks and comments; text is
    ``{title}\\n{body}`` where title is the ``<title>`` inner text and body
    is the tag-stripped, whitespace-collapsed ``<body>`` inner text (the
    whole document when no ``<body>`` tag).  Empty title → body only.
    """
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    html = _COMMENT.sub(" ", _SCRIPT_STYLE.sub(" ", html))
    m = _TITLE.search(html)
    title = _clean_fragment(m.group(1)) if m else ""
    mb = _BODY.search(html)
    body_src = mb.group(1) if mb else _TITLE.sub(" ", html)
    body = _clean_fragment(body_src)
    if title and body:
        return f"{title}\n{body}"
    return title or body
