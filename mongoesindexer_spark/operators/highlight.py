"""ES ``highlight``: marked-up snippets for search hits.

ES highlights by fetching each hit's ``_source``, re-analyzing the field
and wrapping query-term matches in ``<em>`` tags inside a bounded
fragment (plain highlighter, ``number_of_fragments=1``).  The engine
analog: the index stores no ``_source`` (doc_stats carries url only), so
the hit set joins back to the SOURCE table — a broadcast semi-join of ≤k
doc_ids against the corpus, the ``_source`` fetch re-expressed as the
idiomatic Spark shape — and the fragment is computed with pure JVM array
expressions (no Python in the row path):

- first match: min index of any query term in the tokenized text,
- fragment: ``window`` tokens each side of it,
- markup: every in-fragment token equal to a query term is wrapped.

Tokenization here is the driver-gate corpus shape (lowercase whitespace
split) — the same expression the SQL oracle uses; for analyzer-chain
corpora the fragment tokens come from the index analyzer upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRE_TAG = "<em>"
POST_TAG = "</em>"


def _term_array(terms: list[str]) -> Column:
    return F.array(*[F.lit(t) for t in terms])


def highlight_fragment(text: Column, terms: list[str], window: int = 5
                       ) -> Column:
    """One marked-up fragment (or NULL when no term matches): ``window``
    tokens of context either side of the FIRST query-term occurrence,
    matches wrapped in <em></em> — whole-stage-codegen array expressions
    throughout."""
    toks = F.filter(F.split(F.lower(text), r"\s+"),
                    lambda x: x != F.lit(""))
    ta = _term_array(terms)
    # 1-based position of the first token that is a query term
    pos = F.array_min(F.filter(
        F.transform(toks, lambda x, i: F.when(
            F.array_contains(ta, x), i + F.lit(1))),
        lambda p: p.isNotNull()))
    start = F.greatest(F.lit(1), pos - F.lit(window))
    snip = F.slice(toks, start, 2 * window + 1)
    marked = F.transform(snip, lambda x: F.when(
        F.array_contains(ta, x),
        F.concat(F.lit(PRE_TAG), x, F.lit(POST_TAG))).otherwise(x))
    return F.when(pos.isNotNull(), F.array_join(marked, " "))


def highlight_hits(docs: DataFrame, hit_ids: list[int], terms: list[str],
                   window: int = 5, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, fragment) for the hit docs — the ≤k-row _source fetch:
    the id predicate is an ``isin`` pushed into the source scan, the
    fragment a single codegen'd expression.  Docs where no term matches
    (possible when the hit came from another field) are returned with a
    NULL fragment, like ES omitting the field from ``highlight``."""
    return (docs
            .filter(F.col(id_col).isin([int(d) for d in hit_ids]))
            .select(F.col(id_col).alias("doc_id"),
                    highlight_fragment(F.col(text_col), terms, window)
                    .alias("fragment")))
