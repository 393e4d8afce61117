"""function_score / field_value_factor (operators/function_score.py):
kernel vs spark locus rank identity, brute-force correctness, missing
handling, and argument validation."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fs_index(spark, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    d = str(tmp_path_factory.mktemp("idx-fs"))
    rows = [(f"u{i}", "common " + ("extra " * (i % 3)) + f"w{i}",
             (i + 1) * 7 if i != 4 else None)
            for i in range(12)]
    df = spark.createDataFrame(rows, "url string, text string, pop long")
    IndexBuilder(d, n_buckets=2, numeric_fields=("pop",)).build(spark, df)
    return d, rows


@pytest.mark.parametrize("modifier,boost_mode", [
    ("log1p", "multiply"), ("sqrt", "multiply"), ("none", "sum")])
def test_function_score_matches_bruteforce(spark, fs_index, oracle_tiny,
                                           modifier, boost_mode):
    from mongoesindexer_spark.operators.function_score import \
        function_score_topk
    from tests.oracle import OracleIndex
    import pandas as pd
    d, rows = fs_index
    pdf = pd.DataFrame(rows, columns=["url", "text", "pop"])
    pdf["html"] = None
    oi = OracleIndex.build(pdf)
    pops = {i: r[2] for i, r in enumerate(
        sorted(rows, key=lambda r: r[0]))}

    q, k, factor = "common", 8, 0.1

    def weight(v):
        x = factor * (v if v is not None else 1.0)
        return {"log1p": math.log1p(x), "sqrt": math.sqrt(x),
                "none": x}[modifier]

    cand = set(oi.postings.get("common", {}))
    want = []
    for doc in cand:
        s = oi.score(q, doc)
        w = weight(pops[doc])
        want.append((s * w if boost_mode == "multiply" else s + w, doc))
    want.sort(key=lambda x: (-x[0], x[1]))

    for locus in ("kernel", "spark"):
        got = function_score_topk(spark, d, q, k, "pop", factor=factor,
                                  modifier=modifier, boost_mode=boost_mode,
                                  locus=locus)
        assert [int(x) for x in got["doc_id"]] == [doc for _, doc
                                                   in want[:k]], locus
        for gs, (ws, _) in zip(got["score"], want):
            assert abs(gs - ws) < 1e-9


def test_function_score_validation(spark, fs_index):
    from mongoesindexer_spark.operators.function_score import \
        function_score_topk
    d, _ = fs_index
    with pytest.raises(ValueError):
        function_score_topk(spark, d, "common", 5, "pop", modifier="exp")
    with pytest.raises(ValueError):
        function_score_topk(spark, d, "common", 5, "pop", boost_mode="max")
    with pytest.raises(KeyError, match="nope_num"):
        function_score_topk(spark, d, "common", 5, "nope")
