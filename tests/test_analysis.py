"""Golden tests for the analyzer chain (SURVEY §5.2-1: per-row invariant).

These pin the engine's tokenization spec byte-exactly; the same functions
run inside Spark pandas UDFs, and tests/test_build_index.py asserts the
Spark path emits identical tokens.
"""

from mongoesindexer_spark.functions.analysis import (
    KEYWORD,
    LTD_DOC,
    analyze_index,
    analyze_search,
    asciifolding,
    edge_ngram,
    extract_text,
    lowercase,
    normalize,
    stop_filter,
    whitespace_tokenize,
    word_delimiter,
)


def test_whitespace_tokenizer():
    assert whitespace_tokenize("a  b\tc\nd") == ["a", "b", "c", "d"]
    assert whitespace_tokenize("  ") == []


def test_lowercase():
    assert lowercase(["WiFi", "ÉTÉ"]) == ["wifi", "été"]


GOLDEN_WD = {
    # simple token: emitted as-is
    "hello": ["hello"],
    # hyphenated: original + parts + catenations (words==all, deduped)
    "state-of-the-art": ["state-of-the-art", "state", "of", "the", "art", "stateoftheart"],
    # underscore delimits too
    "ipv6_addr": ["ipv6_addr", "ipv", "6", "addr", "ipvaddr", "ipv6addr"],
    # mixed alnum + punctuation: IC-01/04
    "ic-01/04": ["ic-01/04", "ic", "01", "04", "0104", "ic0104"],
    # case transition (only fires when not pre-lowercased)
    "PowerShell": ["PowerShell", "Power", "Shell"],
    # digits-letters transition
    "wifi6": ["wifi6", "wifi", "6"],
    # possessive stemming
    "john's": ["john's", "john"],
    # pure punctuation: dropped
    "--": [],
    # accents survive (folding is a separate filter)
    "lubanga-dyilo": ["lubanga-dyilo", "lubanga", "dyilo", "lubangadyilo"],
}


def test_word_delimiter_golden():
    for tok, want in GOLDEN_WD.items():
        assert word_delimiter([tok]) == want, tok


def test_word_delimiter_catenate_dedup():
    # PowerShell catenations: words="PowerShell" == original → deduped
    assert word_delimiter(["PowerShell"]) == ["PowerShell", "Power", "Shell"]


def test_edge_ngram():
    assert edge_ngram(["spark"], 2, 3) == ["sp", "spa"]
    assert edge_ngram(["ab"], 3, 5) == []
    assert edge_ngram(["abc"], 1, 100) == ["a", "ab", "abc"]


def test_asciifolding_and_normalize():
    assert asciifolding("café") == "cafe"
    assert normalize("Café Été") == "cafe ete"


def test_stop_filter():
    assert stop_filter(["the", "Fast", "and", "slow"]) == ["Fast", "slow"]


GOLDEN_ANALYZE = {
    "The WiFi café": ["the", "wifi", "café"],
    "State-of-the-art IPv6_addr": [
        "state-of-the-art", "state", "of", "the", "art", "stateoftheart",
        "ipv6_addr", "ipv", "6", "addr", "ipvaddr", "ipv6addr",
    ],
}


def test_analyze_index_ltd_doc_golden():
    for text, want in GOLDEN_ANALYZE.items():
        assert analyze_index(text, LTD_DOC) == want


def test_analyze_search_asymmetric():
    # ltd_doc search analyzer: no word_delimiter → hyphenated stays whole
    assert analyze_search("State-of-the-art", LTD_DOC) == ["state-of-the-art"]
    # keyword-family search analyzer includes word_delimiter
    assert analyze_search("State-of-the-art", KEYWORD) == [
        "state-of-the-art", "state", "of", "the", "art", "stateoftheart",
    ]


def test_analyze_index_keyword_edge_ngrams():
    # keyword family: edge_ngram(1,100) after WDF
    toks = analyze_index("ab", KEYWORD)
    assert toks == ["a", "ab"]


def test_extract_text_fixture_shape():
    html = b"<html><head><title>My Title</title></head><body><p>hello world</p></body></html>"
    assert extract_text(html) == "My Title\nhello world"


def test_extract_text_strips_script_and_style():
    html = (
        b"<html><head><title>T</title><style>p{color:red}</style></head>"
        b"<body><p>keep</p><script>var x=1;</script><p>this</p></body></html>"
    )
    assert extract_text(html) == "T\nkeep this"


def test_extract_text_no_body_no_title():
    assert extract_text(b"<p>just text</p>") == "just text"
    assert extract_text(None) is None


def test_extract_text_idempotent_bytes_vs_str():
    html = "<html><head><title>É</title></head><body>café</body></html>"
    assert extract_text(html) == extract_text(html.encode("utf-8")) == "É\ncafé"


def test_memoized_chain_equals_unmemoized():
    """The token cache must be a pure memo: chain output == direct filter
    composition for any input, including specials and stopwords."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from mongoesindexer_spark.functions import analysis as A

    token = st.one_of(
        st.sampled_from(["WiFi", "state-of-the-art", "IC-01/04", "café",
                         "the", "ipv6_addr", "--", "john's", "a1b2C3"]),
        st.text(alphabet="abzAZ019'-_é/ ", min_size=1, max_size=8),
    )

    @given(st.lists(token, max_size=12))
    @settings(max_examples=300, deadline=None)
    def check(tokens):
        text = " ".join(tokens)
        for cfg in (A.LTD_DOC, A.KEYWORD):
            direct = A.word_delimiter(A.lowercase(A.whitespace_tokenize(text)))
            if cfg.use_stopwords:
                direct = A.stop_filter(direct, cfg.stopwords)
            if cfg.use_edge_ngram:
                direct = A.edge_ngram(direct, cfg.min_gram, cfg.max_gram)
            assert A.analyze_index(text, cfg) == direct
            sdirect = A.lowercase(A.whitespace_tokenize(text))
            if cfg.search_word_delimiter:
                sdirect = A.word_delimiter(sdirect)
            if cfg.use_stopwords:
                sdirect = A.stop_filter(sdirect, cfg.stopwords)
            assert A.analyze_search(text, cfg) == sdirect

    check()


def test_same_name_configs_do_not_share_token_cache():
    """The analyzer token cache namespaces by the FULL config value: two
    configs sharing a name but differing in flags must not serve each
    other's cached tokenizations (regression: cache keyed on cfg.name
    silently cross-poisoned them)."""
    from mongoesindexer_spark.functions.analysis import (AnalyzerConfig,
                                                         analyze_index)

    plain = AnalyzerConfig()                      # name "ltd_docs"
    stopped = AnalyzerConfig(use_stopwords=True)  # same default name
    text = "the quick the brown"
    # warm the cache with the plain config first, then query the stopped
    # one — before the fix, the second call returned the cached
    # un-filtered tuples
    with_stops = analyze_index(text, plain)
    without = analyze_index(text, stopped)
    assert "the" in with_stops
    assert "the" not in without
    # equal config VALUES still share cache entries (fresh equal instance)
    assert analyze_index(text, AnalyzerConfig()) == with_stops
