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


def _decay_weight(v, fn, origin, scale, offset, decay):
    dist = max(abs(v - origin) - offset, 0.0)
    if fn == "gauss":
        return math.exp(math.log(decay) * (dist / scale) ** 2)
    if fn == "exp":
        return math.exp(math.log(decay) * dist / scale)
    s = scale / (1.0 - decay)
    return max((s - dist) / s, 0.0)


@pytest.mark.parametrize("fn,offset,boost_mode", [
    ("gauss", 0.0, "multiply"), ("exp", 5.0, "multiply"),
    ("linear", 0.0, "sum")])
def test_decay_score_matches_bruteforce(spark, fs_index, fn, offset,
                                        boost_mode):
    from mongoesindexer_spark.operators.function_score import \
        decay_score_topk
    from tests.oracle import OracleIndex
    import pandas as pd
    d, rows = fs_index
    pdf = pd.DataFrame(rows, columns=["url", "text", "pop"])
    pdf["html"] = None
    oi = OracleIndex.build(pdf)
    pops = {i: r[2] for i, r in enumerate(sorted(rows, key=lambda r: r[0]))}

    q, k, origin, scale, decay = "common", 8, 30.0, 20.0, 0.5
    cand = set(oi.postings.get("common", {}))
    want = []
    for doc in cand:
        s = oi.score(q, doc)
        v = pops[doc] if pops[doc] is not None else origin
        w = _decay_weight(float(v), fn, origin, scale, offset, decay)
        want.append((s * w if boost_mode == "multiply" else s + w, doc))
    want.sort(key=lambda x: (-x[0], x[1]))

    for locus in ("kernel", "spark"):
        got = decay_score_topk(spark, d, q, k, "pop", origin=origin,
                               scale=scale, offset=offset, decay=decay,
                               fn=fn, boost_mode=boost_mode, locus=locus)
        assert [int(x) for x in got["doc_id"]] == [doc for _, doc
                                                   in want[:k]], locus
        for gs, (ws, _) in zip(got["score"], want):
            assert abs(gs - ws) < 1e-9


def test_decay_weight_shape():
    """The decay formulas hit their ES-documented anchor points: weight
    1 at the origin (and inside the offset), exactly ``decay`` at
    distance ``scale``, linear clamps to 0 past its support."""
    from mongoesindexer_spark.operators.function_score import _decay_np
    for fn in ("gauss", "exp", "linear"):
        w = _decay_np(np.array([30.0, 50.0, 1e6]), fn,
                      origin=30.0, scale=20.0, offset=0.0, decay=0.37)
        assert w[0] == pytest.approx(1.0)
        assert w[1] == pytest.approx(0.37)
        assert w[2] == pytest.approx(0.0, abs=1e-12)
    w = _decay_np(np.array([33.0]), "gauss", 30.0, 20.0, 5.0, 0.5)
    assert w[0] == pytest.approx(1.0)     # inside offset → no decay


def test_decay_validation(spark, fs_index):
    from mongoesindexer_spark.operators.function_score import \
        decay_score_topk
    d, _ = fs_index
    for kwargs in ({"fn": "sigmoid"}, {"decay": 0.0}, {"decay": 1.0},
                   {"scale": 0.0}, {"offset": -1.0},
                   {"boost_mode": "max"}, {"locus": "driver"}):
        args = {"origin": 0.0, "scale": 10.0, **kwargs}
        with pytest.raises(ValueError):
            decay_score_topk(spark, d, "common", 5, "pop", **args)


def test_rank_feature_matches_bruteforce(spark, tmp_path_factory):
    """ES rank_feature: BM25 + boost x f(feature), saturation/log/
    sigmoid, missing feature contributes 0."""
    import numpy as np
    import pandas as pd
    import pytest as _pt
    from tests.oracle import OracleIndex
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.function_score import \
        rank_feature_topk

    d = str(tmp_path_factory.mktemp("idx-rankfeat"))
    rows = []
    for i in range(20):
        pr = (i * 7) % 13 + 1 if i % 6 != 0 else None   # some missing
        rows.append((f"u{i:02d}", "common " + ("extra " * (i % 3))
                     + f"w{chr(97 + i)}", pr))
    df = spark.createDataFrame(rows, "url string, text string, pr long")
    IndexBuilder(d, n_buckets=2, block_size=8,
                 numeric_fields=("pr",)).build(spark, df)
    pdf = pd.DataFrame([(u, t) for u, t, _ in rows],
                       columns=["url", "text"])
    pdf["html"] = None
    oi = OracleIndex.build(pdf)

    def brute(fn, pivot=None, sf=1.0, ex=1.0, boost=1.0):
        out = []
        for i, (_, t, pr) in enumerate(rows):
            toks = t.split()
            if "common" not in toks and "extra" not in toks:
                continue
            s = oi.score("common extra", i)
            if pr is not None:
                x = float(pr)
                if fn == "saturation":
                    w = x / (x + pivot)
                elif fn == "log":
                    w = np.log(sf + x)
                else:
                    w = x ** ex / (x ** ex + pivot ** ex)
                s += boost * w
            out.append((s, i))
        out.sort(key=lambda x: (-x[0], x[1]))
        return out[:10]

    cases = [("saturation", dict(pivot=5.0, boost=2.0)),
             ("log", dict(scaling_factor=2.0, boost=0.7)),
             ("sigmoid", dict(pivot=6.0, exponent=2.0, boost=1.5))]
    for fn, kw in cases:
        got = rank_feature_topk(spark, d, "common extra", 10, "pr",
                                function=fn, **kw)
        bkw = dict(pivot=kw.get("pivot"), sf=kw.get("scaling_factor",
                                                    1.0),
                   ex=kw.get("exponent", 1.0), boost=kw["boost"])
        want = brute(fn, **bkw)
        assert [int(x) for x in got["doc_id"]] == [i for _, i in want], fn
        for g, (w, _) in zip(got["score"], want):
            assert abs(g - w) < 1e-9, fn
    with _pt.raises(ValueError):
        rank_feature_topk(spark, d, "common", 5, "pr",
                          function="saturation")   # pivot required
    with _pt.raises(ValueError):
        rank_feature_topk(spark, d, "common", 5, "pr", function="sqrt")


def test_function_score_compose_matches_bruteforce(spark,
                                                   tmp_path_factory):
    """Function-array composition: every score_mode and boost_mode,
    per-function filters and weights, max_boost cap, min_score cut,
    no-matching-function factor 1.0 — vs brute force."""
    import math
    import numpy as np
    import pandas as pd
    import pytest as _pt
    from tests.oracle import OracleIndex
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.function_score import \
        function_score_compose_topk

    d = str(tmp_path_factory.mktemp("idx-fscomp"))
    rows = []
    for i in range(20):
        pr = (i * 7) % 13 + 1
        tag = "t0" if i % 3 == 0 else ("t1" if i % 3 == 1 else None)
        rows.append((f"u{i:02d}", "common " + ("extra " * (i % 3))
                     + f"w{chr(97 + i)}", pr, tag))
    df = spark.createDataFrame(
        rows, "url string, text string, pr long, tag string")
    IndexBuilder(d, n_buckets=2, block_size=8, numeric_fields=("pr",),
                 keyword_fields=("tag",)).build(spark, df)
    pdf = pd.DataFrame([(u, t) for u, t, _, _ in rows],
                       columns=["url", "text"])
    pdf["html"] = None
    oi = OracleIndex.build(pdf)

    FNS = [
        {"kind": "field_value_factor", "field": "pr", "factor": 0.5,
         "modifier": "log1p", "weight": 2.0},
        {"kind": "gauss", "field": "pr", "origin": 6.0, "scale": 4.0,
         "weight": 1.0},
        {"kind": "weight", "weight": 3.0, "filter": ("tag", "t0")},
    ]

    def fvals(i):
        pr = rows[i][2]
        out = []
        out.append((True, 2.0 * math.log1p(0.5 * pr), 2.0))
        out.append((True,
                    math.exp(math.log(0.5) * (abs(pr - 6.0) / 4.0) ** 2),
                    1.0))
        out.append((rows[i][3] == "t0", 3.0, 3.0))
        return out

    def brute(score_mode, boost_mode, max_boost=None, min_score=None):
        res = []
        for i, (_, t, _, _) in enumerate(rows):
            toks = t.split()
            if "common" not in toks and "extra" not in toks:
                continue
            bm = oi.score("common extra", i)
            fs = [(v, w) for m, v, w in fvals(i) if m]
            if not fs:
                c = 1.0
            elif score_mode == "multiply":
                c = 1.0
                for v, _ in fs:
                    c *= v
            elif score_mode == "sum":
                c = sum(v for v, _ in fs)
            elif score_mode == "avg":
                c = sum(v for v, _ in fs) / sum(w for _, w in fs)
            elif score_mode == "first":
                c = fs[0][0]
            elif score_mode == "max":
                c = max(v for v, _ in fs)
            else:
                c = min(v for v, _ in fs)
            if max_boost is not None:
                c = min(c, max_boost)
            s = {"multiply": bm * c, "replace": c, "sum": bm + c,
                 "avg": (bm + c) / 2.0, "max": max(bm, c),
                 "min": min(bm, c)}[boost_mode]
            if min_score is not None and s < min_score:
                continue
            res.append((s, i))
        res.sort(key=lambda x: (-x[0], x[1]))
        return res[:10]

    import itertools
    for sm, bm_ in itertools.product(
            ("multiply", "sum", "avg", "first", "max", "min"),
            ("multiply", "replace", "sum")):
        got = function_score_compose_topk(
            spark, d, "common extra", 10, FNS, score_mode=sm,
            boost_mode=bm_)
        want = brute(sm, bm_)
        assert [int(x) for x in got["doc_id"]] == [i for _, i in want], \
            (sm, bm_)
        for g, (w, _) in zip(got["score"], want):
            assert abs(g - w) < 1e-9, (sm, bm_)
    # max_boost + min_score
    got = function_score_compose_topk(
        spark, d, "common extra", 10, FNS, score_mode="sum",
        boost_mode="multiply", max_boost=3.0, min_score=1.0)
    want = brute("sum", "multiply", max_boost=3.0, min_score=1.0)
    assert [int(x) for x in got["doc_id"]] == [i for _, i in want]
    with _pt.raises(ValueError):
        function_score_compose_topk(spark, d, "common", 5, FNS,
                                    score_mode="median")
    with _pt.raises(ValueError):
        function_score_compose_topk(spark, d, "common", 5, [])
