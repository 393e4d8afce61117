"""Unit + property tests for the posting-list encoding kernel (SURVEY §5.2-3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mongoesindexer_spark.functions.encode import (
    bm25_idf,
    bm25_tf_norm,
    decode_block,
    delta_decode,
    delta_encode,
    encode_blocks,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**40, 2**62], dtype=np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.int64)) == b""
    assert varbyte_decode(b"").size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip_property(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    gaps = delta_encode(arr)
    assert (gaps > 0).all()  # strictly increasing doc ids → positive gaps
    assert np.array_equal(delta_decode(gaps), arr)


def test_bm25_components():
    # Lucene form: idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    assert abs(bm25_idf(1, 2) - np.log(1 + 1.5 / 1.5)) < 1e-12
    # tf_norm at tf=1, dl=avgdl: (k1+1)/(1+k1) = 1
    assert abs(bm25_tf_norm(np.array([1]), np.array([10]), 10.0)[0] - 1.0) < 1e-12


@given(
    st.sets(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=50, deadline=None)
def test_encode_blocks_roundtrip(ids, tf_seed):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    rng = np.random.RandomState(tf_seed)
    tfs = rng.randint(1, 50, size=doc_ids.size).astype(np.int64)
    doc_lens = rng.randint(1, 500, size=doc_ids.size).astype(np.int64)
    avgdl = float(doc_lens.mean())
    rows = encode_blocks(doc_ids, tfs, doc_lens, avgdl, block_size=64)
    # block invariants
    got_docs, got_tfs = [], []
    prev_last = -1
    tfn = bm25_tf_norm(tfs, doc_lens, avgdl)
    for i, r in enumerate(rows):
        assert r["block_id"] == i
        d, t = decode_block(r["docs_vb"], r["tfs_vb"])
        assert r["first_doc"] == d[0] and r["last_doc"] == d[-1] and r["n"] == d.size
        assert d[0] > prev_last  # blocks ordered, disjoint (skip-pointer navigable)
        prev_last = d[-1]
        got_docs.append(d)
        got_tfs.append(t)
    got_docs = np.concatenate(got_docs)
    got_tfs = np.concatenate(got_tfs)
    assert np.array_equal(got_docs, doc_ids)
    assert np.array_equal(got_tfs, tfs)
    # block_max dominates every member score
    pos = 0
    for r in rows:
        members = tfn[pos : pos + r["n"]]
        assert r["block_max_tfn"] >= members.max() - 1e-12
        pos += r["n"]


def test_encode_blocks_block_id_base():
    ids = np.arange(0, 300, dtype=np.int64)
    tfs = np.ones(300, dtype=np.int64)
    dls = np.full(300, 100, dtype=np.int64)
    rows = encode_blocks(ids, tfs, dls, 100.0, block_size=128, block_id_base=10)
    assert [r["block_id"] for r in rows] == [10, 11, 12]


def test_encode_groups_equals_per_term():
    """The vectorized multi-term encoder must be bit-identical to the
    per-term encode_blocks path (which resume/merge determinism pins)."""
    import numpy as np
    from mongoesindexer_spark.functions.encode import encode_blocks, encode_groups

    rng = np.random.RandomState(11)
    rows = []
    for t in [f"t{i:03d}" for i in range(40)]:
        ids = np.unique(rng.randint(0, 50000, size=rng.randint(1, 400)))
        for d in ids:
            rows.append((t, int(d), int(rng.randint(1, 9)), int(rng.randint(5, 300))))
    rows.sort()
    terms = np.array([r[0] for r in rows], dtype=object)
    ids = np.array([r[1] for r in rows])
    tfs = np.array([r[2] for r in rows])
    dls = np.array([r[3] for r in rows])
    g = encode_groups(terms, ids, tfs, dls, avgdl=88.1, block_size=64,
                      block_id_base=13)
    ref = []
    for t in sorted(set(terms)):
        m = terms == t
        for r in encode_blocks(ids[m], tfs[m], dls[m], 88.1, block_size=64,
                               block_id_base=13):
            r["term"] = t
            ref.append(r)
    assert len(ref) == len(g["term"])
    for i, r in enumerate(ref):
        assert r["term"] == g["term"][i]
        for k in ("block_id", "first_doc", "last_doc", "n", "docs_vb",
                  "tfs_vb", "dls_vb", "max_tf", "min_dl", "sum_tf"):
            assert r[k] == g[k][i], (i, k)
        assert abs(r["block_max_tfn"] - g["block_max_tfn"][i]) < 1e-12


def test_encode_groups_coded_equals_object_path():
    """The integer-space (dictionary-coded) sort+encode must be
    bit-identical to sorting the decoded strings — it is the encode
    kernel's hot path."""
    import numpy as np
    import pandas as pd
    from mongoesindexer_spark.functions.encode import (encode_groups,
                                                       encode_groups_coded)

    rng = np.random.RandomState(11)
    vocab = np.array(
        [f"term{i:03d}" for i in range(40)] + ["a", "zz", "mid"], dtype=object)
    n = 4000
    df = pd.DataFrame({
        "c": rng.randint(0, len(vocab), n),
        "d": rng.randint(0, 1500, n),
        "t": rng.randint(1, 7, n),
        "l": rng.randint(4, 200, n),
    }).drop_duplicates(["c", "d"])
    codes, doc_ids = df.c.values, df.d.values
    terms = vocab[codes]
    order = np.lexsort((doc_ids, terms))
    g1 = encode_groups(terms[order], doc_ids[order], df.t.values[order],
                       df.l.values[order], 57.3, block_size=16,
                       block_id_base=7)
    g2 = encode_groups_coded(codes, vocab, doc_ids, df.t.values,
                             df.l.values, 57.3, block_size=16,
                             block_id_base=7)
    for k in g1:
        assert list(g1[k]) == list(g2[k]), k


def test_encode_groups_coded_empty():
    import numpy as np
    from mongoesindexer_spark.functions.encode import encode_groups_coded

    g = encode_groups_coded(np.array([], dtype=np.int64),
                            np.array([], dtype=object),
                            np.array([], dtype=np.int64),
                            np.array([], dtype=np.int64),
                            np.array([], dtype=np.int64), 1.0)
    assert list(g["term"]) == []


def test_encode_groups_coded_doc_sorted_fast_path():
    """Doc-sorted input takes the single-key stable-argsort path (the flat
    files the build feeds it are always doc-sorted); output must be
    bit-identical to the general lexsort path / object path."""
    import pandas as pd
    from mongoesindexer_spark.functions.encode import (encode_groups,
                                                       encode_groups_coded)

    rng = np.random.RandomState(23)
    vocab = np.array([f"t{i:02d}" for i in range(25)] + ["a"], dtype=object)
    n = 3000
    df = pd.DataFrame({
        "c": rng.randint(0, len(vocab), n),
        "d": np.sort(rng.randint(0, 900, n)),  # doc-sorted like a flat file
        "t": rng.randint(1, 9, n),
        "l": rng.randint(4, 300, n),
    }).drop_duplicates(["c", "d"])
    codes, doc_ids = df.c.values, df.d.values
    assert bool((np.diff(doc_ids) >= 0).all())
    terms = vocab[codes]
    order = np.lexsort((doc_ids, terms))
    g1 = encode_groups(terms[order], doc_ids[order], df.t.values[order],
                       df.l.values[order], 44.0, block_size=32)
    g2 = encode_groups_coded(codes, vocab, doc_ids, df.t.values,
                             df.l.values, 44.0, block_size=32)
    for k in g1:
        assert list(g1[k]) == list(g2[k]), k


def test_varbyte_single_byte_fast_path():
    """All values < 128 → pure-cast path: every byte is the value itself
    (no continuation bits), and decode round-trips."""
    vals = np.array([0, 1, 5, 100, 127], dtype=np.int64)
    enc = varbyte_encode(vals)
    assert enc == bytes([0, 1, 5, 100, 127])
    assert np.array_equal(varbyte_decode(enc), vals)


def test_varbyte_int64_max():
    vals = np.array([2**63 - 1, 0, 127, 128], dtype=np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


@given(st.lists(st.integers(min_value=0, max_value=1 << 40),
                min_size=1, max_size=400, unique=True),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_decode_blocks_into_matches_per_block(ids, seed):
    """Batched concat decode == per-block decode on every array, across
    multiple terms' block lists mixed into one batch."""
    from mongoesindexer_spark.functions.encode import (decode_blocks_into,
                                                       decode_dls)
    rng = np.random.RandomState(seed)
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    tfs = rng.randint(1, 50, size=doc_ids.size).astype(np.int64)
    dls = rng.randint(1, 500, size=doc_ids.size).astype(np.int64)
    # two "terms": full postings and an odd-index subset, small blocks
    rows = encode_blocks(doc_ids, tfs, dls, float(dls.mean()), block_size=7)
    sub = slice(1, None, 2)
    if doc_ids[sub].size:
        rows += encode_blocks(doc_ids[sub], tfs[sub], dls[sub],
                              float(dls.mean()), block_size=7)
    decode_blocks_into(rows)
    for r in rows:
        d, t = decode_block(r["docs_vb"], r["tfs_vb"])
        dl = decode_dls(r["dls_vb"])
        bd, bt, bdl = r["_arrs"]
        assert np.array_equal(bd, d)
        assert np.array_equal(bt, t)
        assert np.array_equal(bdl, dl)
