"""Config-driven aggregation pipelines (the reference's
configuration-as-query surface): the cld_doc/ltd_doc $lookup/$match/
$project shapes, compiled onto DataFrames by plans.pipeline and matched
against hand-composed expectations."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mongoesindexer_spark.plans.pipeline import compile_pipeline


@pytest.fixture(scope="module")
def collections(spark):
    cld_doc = spark.createDataFrame([
        Row(_id=1, Title="finding one", cldFieldLanguageId=10, ltdDocId=100,
            deleted=False),
        Row(_id=2, Title="finding two", cldFieldLanguageId=11, ltdDocId=101,
            deleted=False),
        Row(_id=3, Title="finding three", cldFieldLanguageId=99,  # dangling FK
            ltdDocId=102, deleted=True),
    ])
    cld_field = spark.createDataFrame([
        Row(_id=10, name="English"), Row(_id=11, name="French"),
    ])
    ltd_doc = spark.createDataFrame([
        Row(_id=100, title="decision A", languageIds=[20, 21], deleted=False),
        Row(_id=101, title="decision B", languageIds=[21], deleted=True),
        Row(_id=102, title="decision C", languageIds=[], deleted=False),
    ])
    language = spark.createDataFrame([
        Row(_id=20, name="English", langISO="en", internal="x"),
        Row(_id=21, name="French", langISO="fr", internal="y"),
    ])
    tables = {"CldDoc": cld_doc, "CldField": cld_field, "LtdDoc": ltd_doc,
              "Language": language}
    return tables


# the cld_doc.config.json shape (configs/cld_doc.config.json:9-140): two
# top-level lookups — one plain, one with a nested array-localField lookup
# and a $match in its sub-pipeline — then a $project with a literal field
PIPELINE = json.loads("""
[
 {"$lookup": {"from": "CldField", "localField": "cldFieldLanguageId",
              "foreignField": "_id", "as": "cldFieldLanguage"}},
 {"$lookup": {"from": "LtdDoc", "localField": "ltdDocId",
              "foreignField": "_id", "as": "ltdDoc",
              "pipeline": [
                {"$match": {"deleted": false}},
                {"$lookup": {"from": "Language", "localField": "languageIds",
                             "foreignField": "_id", "as": "languages",
                             "pipeline": [{"$project": {"name": 1, "langISO": 1}}]}},
                {"$project": {"title": 1, "languages": 1}}
              ]}},
 {"$project": {"doc_type": "CldDoc", "Title": 1, "cldFieldLanguage": 1,
               "ltdDoc": 1}}
]
""")


def test_cld_doc_pipeline(spark, collections):
    out = compile_pipeline(collections["CldDoc"], PIPELINE,
                           collections.__getitem__)
    rows = {r["_id"]: r for r in out.collect()}
    # row count preserved; _id kept implicitly in include-mode $project
    assert set(rows) == {1, 2, 3}
    assert set(out.columns) == {"_id", "doc_type", "Title", "cldFieldLanguage",
                                "ltdDoc"}
    assert all(r["doc_type"] == "CldDoc" for r in rows.values())
    # plain lookup: matched dim row as single-element struct array
    assert [c["name"] for c in rows[1]["cldFieldLanguage"]] == ["English"]
    assert rows[3]["cldFieldLanguage"] == []          # dangling FK -> empty
    # nested lookup: doc 1 -> LtdDoc 100 (live) with 2 languages projected
    ltd = rows[1]["ltdDoc"]
    assert len(ltd) == 1 and ltd[0]["title"] == "decision A"
    langs = {(x["name"], x["langISO"]) for x in ltd[0]["languages"]}
    assert langs == {("English", "en"), ("French", "fr")}
    assert "internal" not in ltd[0]["languages"][0].asDict()
    # sub-pipeline $match filters deleted LtdDoc 101 -> doc 2 gets []
    assert rows[2]["ltdDoc"] == []
    # empty languageIds array -> empty languages
    ltd3 = rows[3]["ltdDoc"]
    assert len(ltd3) == 1 and ltd3[0]["languages"] == []


def test_array_local_field_any_semantics(spark, collections):
    """Array localField matches ANY element; each foreign doc appears
    once even when the local array repeats its id."""
    parent = spark.createDataFrame(
        [Row(_id=1, ids=[20, 20, 21]), Row(_id=2, ids=None)])
    out = compile_pipeline(
        parent,
        [{"$lookup": {"from": "Language", "localField": "ids",
                      "foreignField": "_id", "as": "hits",
                      "pipeline": [{"$project": {"langISO": 1}}]}}],
        collections.__getitem__)
    rows = {r["_id"]: r for r in out.collect()}
    assert sorted(x["langISO"] for x in rows[1]["hits"]) == ["en", "fr"]
    assert rows[2]["hits"] == []


def test_match_operators(spark, collections):
    out = compile_pipeline(
        collections["LtdDoc"],
        [{"$match": {"deleted": False, "_id": {"$gte": 101}}}],
        collections.__getitem__)
    assert [r["_id"] for r in out.collect()] == [102]


def test_exclude_mode_project(spark, collections):
    out = compile_pipeline(collections["Language"],
                           [{"$project": {"internal": 0}}],
                           collections.__getitem__)
    assert set(out.columns) == {"_id", "name", "langISO"}


def test_config_carries_pipeline(tmp_path, spark, collections):
    from mongoesindexer_spark.config import IndexConfig
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "source_table": "CldDoc", "index_name": "cld_docs",
        "aggregation_pipeline": PIPELINE,
    }))
    cfg = IndexConfig.from_json(str(p))
    assert len(cfg.aggregation_pipeline) == 3
    out = cfg.apply_pipeline(collections["CldDoc"], collections.__getitem__)
    assert out.count() == 3 and "doc_type" in out.columns


def test_pipeline_plan_broadcasts(spark, collections):
    """Dimension lookups must compile to broadcast joins (no shuffle of
    the parent on a dim join)."""
    out = compile_pipeline(collections["CldDoc"], PIPELINE[:1],
                           collections.__getitem__)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_empty_match_is_noop(spark, collections):
    out = compile_pipeline(collections["CldDoc"], [{"$match": {}}],
                           collections.__getitem__)
    assert out.count() == 3


def test_project_non_string_literal_raises(spark, collections):
    with pytest.raises(ValueError, match="unsupported .project values"):
        compile_pipeline(collections["CldDoc"],
                         [{"$project": {"Title": 1, "weight": 2.5}}],
                         collections.__getitem__).collect()


def test_in_with_null_matches_missing(spark, collections):
    """{deletedAt: {$in: [null, false]}} — Mongo's keep-non-deleted idiom —
    must match rows whose field is NULL (Spark isin never matches null)."""
    df = spark.createDataFrame(
        [Row(_id=1, deletedAt=None), Row(_id=2, deletedAt="2024-01-01"),
         Row(_id=3, deletedAt="x")],
        "_id long, deletedAt string")
    out = compile_pipeline(df, [{"$match": {"deletedAt": {"$in": [None, "x"]}}}],
                           lambda n: None)
    assert sorted(r["_id"] for r in out.collect()) == [1, 3]


def test_project_field_path_vs_literal(spark, collections):
    """"$Title" copies the Title field; "CldDoc" (no $) injects a literal."""
    out = compile_pipeline(collections["CldDoc"],
                           [{"$project": {"title_copy": "$Title",
                                          "doc_type": "CldDoc"}}],
                           collections.__getitem__)
    rows = {r["_id"]: r for r in out.collect()}
    assert rows[1]["title_copy"] == "finding one"
    assert rows[1]["doc_type"] == "CldDoc"


def test_nested_scalar_lookup_distinct_join_keys(spark, collections):
    """A scalar-localField $lookup inside another $lookup's sub-pipeline:
    the two hidden join keys must not collide (DataFrame.drop(name) drops
    every column with that name)."""
    pipe = [{"$lookup": {
        "from": "CldDoc", "localField": "_id", "foreignField": "ltdDocId",
        "as": "cldDocs",
        "pipeline": [
            {"$lookup": {"from": "CldField", "localField": "cldFieldLanguageId",
                         "foreignField": "_id", "as": "lang"}},
            {"$project": {"Title": 1, "lang": 1}},
        ]}}]
    out = compile_pipeline(collections["LtdDoc"], pipe,
                           collections.__getitem__)
    rows = {r["_id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[100]["cldDocs"][0]["lang"][0]["name"] == "English"
    assert rows[102]["cldDocs"][0]["lang"] == []   # dangling inner FK
