"""Index-time synonym expansion (ES synonym token filter):
token-stream semantics, positional sharing (phrase-through-synonym),
end-to-end retrieval, and config plumbing."""

import pytest


def test_synonym_token_stream():
    from mongoesindexer_spark.functions.analysis import (AnalyzerConfig,
        analyze_index, analyze_index_pos, analyze_search, synonym_filter)
    cfg = AnalyzerConfig(name="syn-test",
                         synonyms=(("quick", "fast"), ("big", "large")))
    # member emits itself first, then the rest of its group
    assert analyze_index("quick dog", cfg) == ["quick", "fast", "dog"]
    assert analyze_index("fast big", cfg) == ["fast", "quick", "big",
                                              "large"]
    # expansion tokens share the SOURCE token's position (Lucene
    # positionIncrement 0) — phrase semantics depend on this
    toks, poss = analyze_index_pos("quick dog", cfg)
    assert toks == ["quick", "fast", "dog"] and poss == [0, 0, 1]
    # search side is NOT expanded (index-time expansion form)
    assert analyze_search("quick", cfg) == ["quick"]
    assert synonym_filter(["x"], ()) == ["x"]


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    import dataclasses

    from mongoesindexer_spark.functions.analysis import LTD_DOC
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    cfg = dataclasses.replace(LTD_DOC, synonyms=(("quick", "fast"),))
    d = str(tmp_path_factory.mktemp("idx-syn"))
    rows = [("u0", "the fast brown fox"),
            ("u1", "a quick silver car"),
            ("u2", "nothing relevant here"),
            ("u3", "fast fast run")]
    df = spark.createDataFrame(rows, "url string, text string")
    IndexBuilder(d, n_buckets=2, cfg=cfg,
                 index_positions=True).build(spark, df)
    return d


def test_synonym_retrieval(spark, syn_index):
    from mongoesindexer_spark.operators.topk import get_engine
    import dataclasses

    from mongoesindexer_spark.functions.analysis import LTD_DOC
    cfg = dataclasses.replace(LTD_DOC, synonyms=(("quick", "fast"),))
    eng = get_engine(spark, syn_index, cfg=cfg)
    # querying either synonym reaches ALL group docs (u0, u1, u3)
    for q in ("quick", "fast"):
        got = eng.topk_wand(q, 10)
        assert sorted(got["url"]) == ["u0", "u1", "u3"], q
    # df of both terms reflects the expansion (every group doc carries
    # both tokens)
    meta = eng._term_meta(["quick", "fast"])
    assert meta["quick"][1] == meta["fast"][1] == 3


def test_phrase_through_synonym(spark, syn_index):
    import dataclasses

    from mongoesindexer_spark.functions.analysis import LTD_DOC
    from mongoesindexer_spark.operators.topk import get_engine
    cfg = dataclasses.replace(LTD_DOC, synonyms=(("quick", "fast"),))
    eng = get_engine(spark, syn_index, cfg=cfg)
    # "quick brown" must match u0's "fast brown" — the expansion token
    # sits at the source position, so adjacency holds
    got = eng.phrase_topk("quick brown", 10)
    assert list(got["url"]) == ["u0"]


def test_synonyms_config_json(tmp_path):
    import json

    from mongoesindexer_spark.config import IndexConfig
    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "source_table": "s", "index_name": "i",
        "synonyms": [["fast", "quick"]]}))
    cfg = IndexConfig.from_json(str(p))
    assert cfg.analyzer_config().synonyms == (("fast", "quick"),)


def test_synonym_mixed_case_config_members_fold():
    """Review fix: config members fold to lowercase so they match the
    lowercased token stream (and never emit unsearchable terms)."""
    from mongoesindexer_spark.functions.analysis import (AnalyzerConfig,
        analyze_index)
    cfg = AnalyzerConfig(name="syn-case", synonyms=(("Fast", "QUICK"),))
    assert analyze_index("fast dog", cfg) == ["fast", "quick", "dog"]
    assert analyze_index("Quick", cfg) == ["quick", "fast"]
