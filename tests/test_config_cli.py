"""Config loader (S10 parity) and catalog seam tests."""

import json
import os

import pytest

from mongoesindexer_spark.config import IndexConfig, load_config_dir
from mongoesindexer_spark.sources.catalog import ParquetCatalog


def test_config_roundtrip(tmp_path):
    cfg = {"source_table": "pages", "index_name": "web_idx",
           "exclude_fields": ["downloads"], "analyzer": "keywords",
           "force_delete": True}
    p = tmp_path / "web.json"
    p.write_text(json.dumps(cfg))
    c = IndexConfig.from_json(str(p))
    assert c.index_name == "web_idx" and c.force_delete
    assert c.exclude_fields == ("downloads",)
    assert c.analyzer_config().use_edge_ngram  # keywords family
    assert load_config_dir(str(tmp_path))[0] == c


def test_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"source_table": "t", "index_name": "i", "nope": 1}))
    with pytest.raises(ValueError, match="unknown config keys"):
        IndexConfig.from_json(str(p))


def test_catalog_append_overwrite_incremental(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "cat"))
    df1 = spark.createDataFrame([(1,), (2,)], "x long")
    df2 = spark.createDataFrame([(3,)], "x long")
    s1 = cat.append(df1, "t")
    s2 = cat.append(df2, "t")
    assert {r["x"] for r in cat.read(spark, "t").collect()} == {1, 2, 3}
    inc = cat.read_incremental(spark, "t", since=s1)
    assert {r["x"] for r in inc.collect()} == {3}
    assert cat.read_incremental(spark, "t", since=s2) is None
    # time travel to s1
    assert {r["x"] for r in cat.read(spark, "t", as_of=s1).collect()} == {1, 2}
    cat.overwrite(spark.createDataFrame([(9,)], "x long"), "t")
    assert {r["x"] for r in cat.read(spark, "t").collect()} == {9}
    assert cat.list_tables() == ["t"]
    cat.drop_table("t")
    assert not cat.table_exists("t")


def test_migrate_append_dedup(spark):
    from mongoesindexer_spark.operators.lookup import migrate_append
    src = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    tgt = spark.createDataFrame([(2, "b")], "k long, v string")
    batch = migrate_append(src, tgt, "k")
    assert sorted(r["k"] for r in batch.collect()) == [1, 3]
    assert migrate_append(src, None, "k").count() == 3


def test_cli_build_all(spark, tmp_path, tiny_dir):
    """indexAll parity: one config dir → one index per config, queryable."""
    import json as _json
    from mongoesindexer_spark.cli import main
    from mongoesindexer_spark.operators.topk import bm25_topk_df

    pages = os.path.join(tiny_dir, "pages.parquet")
    cfgs = tmp_path / "configs"
    cfgs.mkdir()
    for name in ("idx_a", "idx_b"):
        (cfgs / f"{name}.json").write_text(_json.dumps(
            {"source_table": pages, "index_name": name}))
    rc = main(["build-all", "--configs", str(cfgs),
               "--index-root", str(tmp_path)])
    assert rc == 0
    for name in ("idx_a", "idx_b"):
        idx = str(tmp_path / name)
        assert bm25_topk_df(spark, idx, "the", 5).count() > 0


def test_cli_suggest(spark, tiny_index, capsys):
    """suggest command serves the completion table (T7) from the CLI."""
    from mongoesindexer_spark.cli import main
    rc = main(["suggest", "--index", tiny_index, "--prefix", "th", "--k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "term" in out and "weight" in out
    assert "the" in out.split()


def test_deprecated_config_key_ignored(tmp_path):
    """Configs written against the salted-encode engine version carried
    docs_per_salt; they must keep loading (ignored), while genuinely
    unknown keys still fail."""
    import json

    import pytest

    from mongoesindexer_spark.config import IndexConfig

    p = tmp_path / "old.json"
    p.write_text(json.dumps({"source_table": "pages", "index_name": "idx",
                             "docs_per_salt": 131072}))
    cfg = IndexConfig.from_json(str(p))
    assert cfg.index_name == "idx"
    p2 = tmp_path / "bad.json"
    p2.write_text(json.dumps({"source_table": "pages", "index_name": "idx",
                              "totally_unknown": 1}))
    with pytest.raises(ValueError, match="unknown config keys"):
        IndexConfig.from_json(str(p2))


def test_cli_mlt_and_rescore(spark, tmp_path, capsys):
    import pandas as pd
    from mongoesindexer_spark.cli import main
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    d = str(tmp_path / "idx")
    rows = [(f"u{i:02d}", "common alpha beta " + f"w{i}" if i % 2 == 0
             else "common alpha " + f"w{i} beta") for i in range(8)]
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    df = spark.createDataFrame(pdf)
    IndexBuilder(d, n_buckets=2, index_positions=True).build(spark, df)
    pages = str(tmp_path / "pages.parquet")
    pdf2 = pdf.copy()
    pdf2["doc_id"] = range(len(pdf2))   # url asc == insertion order here
    spark.createDataFrame(pdf2[["doc_id", "text"]]).write.parquet(pages)

    rc = main(["mlt", "--index", d, "--pages", pages, "--doc", "0",
               "--k", "5", "--max-terms", "4"])
    out = capsys.readouterr().out
    assert rc in (0, None)
    assert "doc_id" in out and " 0 " not in out.split("\n", 1)[1][:12]

    rc = main(["rescore", "--index", d, "--q", "common",
               "--rescore-q", "alpha beta", "--k", "4", "--window", "8",
               "--rescore-weight", "2.0"])
    out = capsys.readouterr().out
    assert rc in (0, None)
    assert "score" in out


def test_cli_phrase_prefix(spark, tmp_path, capsys):
    import pandas as pd
    from mongoesindexer_spark.cli import main
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    d = str(tmp_path / "idxpp")
    rows = [(f"u{i}", f"alpha beta{i % 2} w{i}") for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    IndexBuilder(d, n_buckets=2, index_positions=True).build(spark, df)
    rc = main(["query", "--index", d, "--q", "alpha bet",
               "--phrase-prefix", "--k", "5"])
    out = capsys.readouterr().out
    assert rc in (0, None) and "doc_id" in out and "u0" in out
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["query", "--index", d, "--q", "alpha bet",
              "--phrase-prefix", "--phrase"])


def test_cli_must_not_and_suggest_phrase(spark, tmp_path, capsys):
    import pandas as pd
    from mongoesindexer_spark.cli import main
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    d = str(tmp_path / "idxmn")
    rows = [(f"u{i}", "apache spark data " + ("spare " if i % 2 else "")
             + f"wz{chr(97 + i)}", "t0" if i % 3 == 0 else None)
            for i in range(9)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text", "tag"]))
    IndexBuilder(d, n_buckets=2, keyword_fields=("tag",),
                 index_positions=True).build(spark, df)
    # must_not term: t0-tagged docs excluded, NULL-tag docs kept
    rc = main(["query", "--index", d, "--q", "data", "--wand",
               "--must-not", "tag:t0", "--k", "9"])
    out = capsys.readouterr().out
    assert rc in (0, None) and "u0" not in out.split() and "u1" in out
    # must_not exists: only docs MISSING tag remain
    rc = main(["query", "--index", d, "--q", "data", "--wand",
               "--must-not-exists", "tag", "--k", "9"])
    out = capsys.readouterr().out
    assert rc in (0, None) and "u3" not in out.split() and "u1" in out
    # clauses COMPOSE (ES bool conjunction): filter AND must_not
    rc = main(["query", "--index", d, "--q", "data", "--wand",
               "--filter", "tag:t0", "--must-not", "tag:t0", "--k", "9"])
    out = capsys.readouterr().out
    assert rc in (0, None) and "u0" not in out.split() \
        and "u1" not in out.split()     # t0 ∩ not-t0 = empty
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["query", "--index", d, "--q", "data",
              "--must-not", "tagonly"])   # malformed spec
    # phrase suggester over the CLI
    rc = main(["suggest-phrase", "--index", d, "--q", "apache sparc",
               "--size", "3"])
    out = capsys.readouterr().out
    assert rc in (0, None) and "apache spark" in out


def test_cli_filter_exists(spark, tmp_path, capsys):
    import pandas as pd
    from mongoesindexer_spark.cli import main
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    d = str(tmp_path / "idxfe")
    rows = [(f"u{i}", "data common", "t0" if i % 2 == 0 else None)
            for i in range(6)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text", "tag"]))
    IndexBuilder(d, n_buckets=2, keyword_fields=("tag",)).build(spark, df)
    rc = main(["query", "--index", d, "--q", "data", "--wand",
               "--filter-exists", "tag", "--k", "6"])
    out = capsys.readouterr().out
    assert rc in (0, None) and "u0" in out and "u1" not in out.split()


def test_cli_simple_query_string(spark, tmp_path, capsys):
    import pandas as pd
    from mongoesindexer_spark.cli import main
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    d = str(tmp_path / "idxsqs")
    rows = [(f"u{i}", "common "
             + ("alpha " if i % 2 == 0 else "")
             + ("nope " if i % 3 == 0 else "")
             + "wz" + chr(97 + i)) for i in range(9)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    IndexBuilder(d, n_buckets=2, index_positions=True).build(spark, df)
    rc = main(["query", "--index", d, "--q", "alpha +common -nope",
               "--sqs", "--k", "9"])
    out = capsys.readouterr().out
    assert rc in (0, None) and "u0" not in out.split() and "u2" in out
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["query", "--index", d, "--q", "x", "--sqs", "--wand",
              "--filter", "tag:t0"])
