"""Pure-Python BM25 oracle (SURVEY §5.2-2): dict-of-lists inverted index,
exact Lucene-form BM25, same analyzer chain as the engine.

Deliberately naive and single-threaded — the point is an independent,
obviously-correct scorer the Spark engine must match rank-identically
(scores within 1e-6, ties broken by doc_id asc).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from mongoesindexer_spark.functions.analysis import (
    LTD_DOC,
    AnalyzerConfig,
    analyze_index,
    analyze_index_pos,
    analyze_search,
    extract_text,
)

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, cfg: AnalyzerConfig = LTD_DOC):
        self.cfg = cfg
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)  # term -> {doc_id: tf}
        self.doc_len: dict[int, int] = {}
        self.urls: dict[int, str] = {}
        # term -> {doc_id: [positions]} (source-token indices, engine spec)
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)

    @classmethod
    def build(cls, pages, cfg: AnalyzerConfig = LTD_DOC) -> "OracleIndex":
        """pages: pandas DataFrame with url/html/text columns.

        doc_id assignment matches the engine: dense rank of url asc.
        Text resolution matches the engine: text if non-null else
        extract_text(html).
        """
        idx = cls(cfg)
        rows = pages.sort_values("url").reset_index(drop=True)
        for doc_id, row in rows.iterrows():
            text = row["text"] if row["text"] is not None else extract_text(row["html"])
            tokens, poss = analyze_index_pos(text, cfg)
            idx.urls[doc_id] = row["url"]
            idx.doc_len[doc_id] = len(tokens)
            for term, tf in Counter(tokens).items():
                idx.postings[term][doc_id] = tf
            for term, p in zip(tokens, poss):
                idx.positions[term].setdefault(doc_id, []).append(p)
        return idx

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len.values()) / max(1, self.n_docs)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, query_text: str, doc_id: int) -> float:
        """BM25 score of one doc for a query (query terms deduplicated, as
        in a Lucene BooleanQuery of unique TermQueries)."""
        s = 0.0
        dl = self.doc_len[doc_id]
        for term in sorted(set(analyze_search(query_text, self.cfg))):
            plist = self.postings.get(term)
            if not plist or doc_id not in plist:
                continue
            tf = plist[doc_id]
            tfn = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
            s += self.idf(term) * tfn
        return s

    def topk(self, query_text: str, k: int) -> list[tuple[int, str, float]]:
        """Exhaustive top-k: [(doc_id, url, score)] sorted by
        (-score, doc_id)."""
        terms = sorted(set(analyze_search(query_text, self.cfg)))
        candidates: set[int] = set()
        for t in terms:
            candidates.update(self.postings.get(t, {}).keys())
        scored = [(d, self.urls[d], self.score(query_text, d)) for d in candidates]
        scored.sort(key=lambda x: (-x[2], x[0]))
        return scored[:k]

    def phrase_freq(self, terms: list[str], doc_id: int) -> int:
        """Number of DISTINCT start positions p with term_j at p+j for all
        j (ES match_phrase, slop=0; duplicate emissions at one position
        count once — the engine spec)."""
        starts = set(self.positions.get(terms[0], {}).get(doc_id, []))
        for j, t in enumerate(terms[1:], start=1):
            at = set(self.positions.get(t, {}).get(doc_id, []))
            starts = {p for p in starts if p + j in at}
            if not starts:
                return 0
        return len(starts)

    def phrase_topk(self, phrase_text: str, k: int) -> list[tuple[int, str, float]]:
        """Exhaustive match_phrase top-k: Lucene BM25 PhraseQuery scoring
        (the phrase is one pseudo-term: tf = phrase_freq, idf = Σ idf of
        the phrase's terms, repeats included)."""
        terms = analyze_search(phrase_text, self.cfg)   # ordered, repeats
        if not terms:
            return []
        idf_sum = sum(self.idf(t) for t in terms)
        scored = []
        for d in self.postings.get(terms[0], {}).keys():
            ptf = self.phrase_freq(terms, d)
            if not ptf:
                continue
            dl = self.doc_len[d]
            tfn = ptf * (K1 + 1.0) / (ptf + K1 * (1.0 - B + B * dl / self.avgdl))
            scored.append((d, self.urls[d], idf_sum * tfn))
        scored.sort(key=lambda x: (-x[2], x[0]))
        return scored[:k]
