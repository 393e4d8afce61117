"""Deterministic fixture synthesis per /root/repo/FIXTURES.md (seed=42).

Generates the ``pages`` table (the BASELINE.json ``input_hint`` shape:
url, warc_ts, html, text, lang), the reference query set, the
``pages_updates`` incremental batch, and the reference-shape relational
star fixtures (docs/doc_pages/languages/keywords — mirrors the
``$lookup`` star in /root/reference/configs/ltd_doc.settings.json:14-176).

Everything is seed-pinned; no external data.  Parquet written with pyarrow
so fixtures can be built without a SparkSession.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

# Special tokens exercising the analyzer chain (FIXTURES.md §1)
SPECIAL_TOKENS = [
    "WiFi", "PowerShell", "state-of-the-art", "ipv6_addr", "IC-01/04",
    "café", "Lubanga-Dyilo",
]

SCALES = {"tiny": 500, "small": 5_000, "bench": 50_000}


def _vocab(n_terms: int = 5000) -> list[str]:
    # deterministic pseudo-words: base-26 ids, 3-9 chars
    words = []
    rng = np.random.RandomState(SEED + 1)
    lengths = rng.randint(3, 10, size=n_terms)
    letters = "abcdefghijklmnopqrstuvwxyz"
    for i, ln in enumerate(lengths):
        r = np.random.RandomState(SEED + 2 + i)
        words.append("".join(letters[j] for j in r.randint(0, 26, size=ln)))
    return words


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def _render_html(title: str, body: str, with_script: bool) -> bytes:
    script = "<script>var x=1;</script>" if with_script else ""
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{body}</p>{script}</body></html>"
    ).encode("utf-8")


def generate_pages(n: int, seed: int = SEED) -> pd.DataFrame:
    """FIXTURES.md §1 pages table."""
    vocab = _vocab()
    probs = _zipf_probs(len(vocab))
    rng = np.random.RandomState(seed)
    langs = ["en", "en", "en", "fr", "es"]
    rows = []
    for i in range(n):
        title_len = int(rng.randint(2, 7))
        body_len = int(rng.randint(20, 201))
        title_toks = list(rng.choice(vocab, size=title_len, p=probs))
        body_toks = list(rng.choice(vocab, size=body_len, p=probs))
        # sprinkle analyzer-exercising tokens deterministically
        if i % 3 == 0:
            body_toks[i % body_len] = SPECIAL_TOKENS[i % len(SPECIAL_TOKENS)]
        if i % 11 == 0:
            title_toks[i % title_len] = SPECIAL_TOKENS[(i // 11) % len(SPECIAL_TOKENS)]
        title = " ".join(title_toks)
        body = " ".join(body_toks)
        text = f"{title}\n{body}"
        rows.append({
            "url": f"https://site{i % 97}.example/p/{i:08d}",
            "warc_ts": EPOCH + timedelta(seconds=i * 137),
            "html": _render_html(title, body, with_script=(i % 10 == 7)),
            "text": None if i % 5 == 0 else text,
            "lang": langs[i % 5],
        })
    return pd.DataFrame(rows)


def generate_queries(n: int = 50, seed: int = SEED) -> pd.DataFrame:
    """FIXTURES.md §2 query set: head/tail terms, conjunctions, analyzer
    edge cases, one absent term, one stopword-heavy query."""
    vocab = _vocab()
    rng = np.random.RandomState(seed + 7)
    ks = [10, 10, 100, 1000]
    rows = []
    for qid in range(n):
        kind = qid % 7
        if kind == 0:  # head term
            q = vocab[int(rng.randint(0, 20))]
        elif kind == 1:  # tail term
            q = vocab[int(rng.randint(4000, 5000))]
        elif kind in (2, 3):  # 2-4 term conjunction, mixed head/tail
            m = int(rng.randint(2, 5))
            q = " ".join(rng.choice(vocab[:800], size=m))
        elif kind == 4:  # analyzer edge-case forms
            q = SPECIAL_TOKENS[qid % len(SPECIAL_TOKENS)]
        elif kind == 5 and qid == 5:  # absent term (empty result)
            q = "zzzzmissingterm"
        elif kind == 5:
            q = " ".join(rng.choice(vocab[:100], size=2))
        else:  # stopword-heavy
            q = "the of and " + vocab[int(rng.randint(0, 200))]
        rows.append({"query_id": qid, "query_text": q, "k": ks[qid % 4]})
    return pd.DataFrame(rows)


def generate_updates(pages: pd.DataFrame, seed: int = SEED) -> pd.DataFrame:
    """FIXTURES.md §3 pages_updates: 20 inserts, 15 updates, 10 deletes."""
    vocab = _vocab()
    probs = _zipf_probs(len(vocab))
    rng = np.random.RandomState(seed + 13)
    later = pages["warc_ts"].max() + timedelta(days=1)
    rows = []
    for i in range(20):
        title = " ".join(rng.choice(vocab, size=3, p=probs))
        body = " ".join(rng.choice(vocab, size=int(rng.randint(20, 80)), p=probs))
        rows.append({
            "op": "insert", "url": f"https://site0.example/p/9{i:07d}",
            "warc_ts": later + timedelta(seconds=i),
            "html": _render_html(title, body, False),
            "text": f"{title}\n{body}", "lang": "en",
        })
    existing = rng.choice(pages["url"].values, size=25, replace=False)
    for i, url in enumerate(existing[:15]):
        title = " ".join(rng.choice(vocab, size=4, p=probs))
        body = " ".join(rng.choice(vocab, size=int(rng.randint(20, 80)), p=probs))
        rows.append({
            "op": "update", "url": url,
            "warc_ts": later + timedelta(seconds=100 + i),
            "html": _render_html(title, body, False),
            "text": f"{title}\n{body}", "lang": "en",
        })
    for i, url in enumerate(existing[15:]):
        rows.append({
            "op": "delete", "url": url,
            "warc_ts": later + timedelta(seconds=200 + i),
            "html": b"", "text": None, "lang": "en",
        })
    return pd.DataFrame(rows)


def generate_star(seed: int = SEED) -> dict[str, pd.DataFrame]:
    """FIXTURES.md §4: docs / doc_pages / languages / keywords star."""
    rng = np.random.RandomState(seed + 21)
    vocab = _vocab()
    probs = _zipf_probs(len(vocab))
    languages = pd.DataFrame({
        "lang_id": [f"L{i:02d}" for i in range(10)],
        "name": ["English", "French", "Spanish", "German", "Arabic",
                 "Chinese", "Russian", "Swahili", "Dutch", "Portuguese"],
        "lang_iso": ["en", "fr", "es", "de", "ar", "zh", "ru", "sw", "nl", "pt"],
    })
    keywords = pd.DataFrame({
        "keyword_id": [f"K{i:04d}" for i in range(200)],
        "title": [" ".join(rng.choice(vocab[:500], size=2)) for _ in range(200)],
    })
    docs_rows, page_rows = [], []
    zipf_pages = np.clip(rng.zipf(1.6, size=1000), 1, 50)
    for i in range(1000):
        doc_id = f"D{i:05d}"
        docs_rows.append({
            "doc_id": doc_id,
            "title": " ".join(rng.choice(vocab, size=4, p=probs)),
            "deleted": bool(i % 17 == 0),
            "is_published": bool(i % 5 != 1),
            "created": EPOCH + timedelta(hours=i),
            "updated": EPOCH + timedelta(hours=i, minutes=int(rng.randint(0, 59))),
            "lang_ids": list(rng.choice(languages["lang_id"], size=int(rng.randint(1, 3)), replace=False)),
            "keyword_ids": list(rng.choice(keywords["keyword_id"], size=int(rng.randint(0, 5)), replace=False)),
        })
        for p in range(int(zipf_pages[i])):
            page_rows.append({
                "page_id": f"P{i:05d}-{p:03d}", "doc_id": doc_id, "page": p,
                "text": " ".join(rng.choice(vocab, size=30, p=probs)),
            })
    return {
        "docs": pd.DataFrame(docs_rows),
        "doc_pages": pd.DataFrame(page_rows),
        "languages": languages,
        "keywords": keywords,
    }


# ---------------------------------------------------------------------------
# materialization (cached under /root/repo/.fixtures/<scale>/)
# ---------------------------------------------------------------------------

_PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def fixture_dir(scale: str = "small", root: str | None = None) -> str:
    """Materialize (once) and return the fixture directory for a scale."""
    n = SCALES[scale]
    root = root or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".fixtures")
    out = os.path.join(root, scale)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    pages = generate_pages(n)
    pq.write_table(pa.Table.from_pandas(pages, schema=_PAGES_SCHEMA, preserve_index=False),
                   os.path.join(out, "pages.parquet"))
    pq.write_table(pa.Table.from_pandas(generate_queries(), preserve_index=False),
                   os.path.join(out, "queries.parquet"))
    upd = generate_updates(pages)
    pq.write_table(
        pa.Table.from_pandas(upd, schema=pa.schema([("op", pa.string())] + list(_PAGES_SCHEMA)), preserve_index=False),
        os.path.join(out, "pages_updates.parquet"))
    for name, df in generate_star().items():
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(out, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out
