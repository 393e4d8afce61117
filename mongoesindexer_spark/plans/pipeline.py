"""Declarative aggregation-pipeline compiler: the reference's
configuration-as-query surface on Spark.

Every reference config carries an ``aggregation_pipeline`` — a Mongo
pipeline of $match / $project / $lookup (with nested sub-pipelines) that
shapes the source collection before indexing (configuration.ts:17,
configs/cld_doc.config.json:9-140, configs/ltd_doc.settings.json:14-240).
This module compiles that JSON shape onto DataFrame operators so a user
can port a reference config verbatim: the pipeline stays data, not code.

Supported stages (the complete set used across /root/reference/configs):

* ``$match``  — field equality, plus ``$ne/$in/$exists/$gt/$gte/$lt/$lte``.
* ``$project``— include flags (``{"f": 1}``), exclusions (``{"f": 0}``),
  and literal injections (``{"doc_type": "CldDoc"}``).  Mongo's implicit
  "keep _id in include mode" rule is honored for ``doc_key``.
* ``$lookup`` — localField/foreignField equi-join with optional
  sub-pipeline; ARRAY-valued localField matches any element (the
  ``languageIds → Language._id`` shape used ten times in ltd_doc).

Compilation strategy (Spark-first, not a Mongo emulator):

* The child side of every $lookup is pre-aggregated per foreign key
  (``groupBy(fk).agg(collect_list(struct(...)))``) and then LEFT-joined —
  one shuffle on the child key, never a groupBy over all parent columns.
  Dimension tables are broadcast by default (reference lookups are all
  id→small-collection joins).
* Array localField compiles to explode(distinct) → join → re-aggregate by
  the parent's ``doc_key`` — the parent table is never duplicated into a
  row explosion that outlives the stage.
* Child arrays are ``array_sort``-ed: Mongo preserves child insertion
  order, which has no Spark analog; deterministic output is the engine's
  contract (SURVEY §2.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _in_condition(c: Column, v) -> Column:
    """Mongo ``$in`` matches null/missing fields when the list contains
    null ({deletedAt: {$in: [null]}} is the standard keep-non-deleted
    idiom); Spark's isin never matches null, so null membership needs an
    explicit isNull branch."""
    vals = list(v)
    non_null = [x for x in vals if x is not None]
    cond = c.isin(non_null) if non_null else F.lit(False)
    if len(non_null) < len(vals):  # null ∈ list
        cond = cond | c.isNull()
    return cond


_MATCH_OPS = {
    "$ne": lambda c, v: (c != F.lit(v)) | c.isNull() if v is not None else c.isNotNull(),
    "$in": _in_condition,
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
}


def _match_condition(spec: dict) -> Column:
    if not spec:
        # Mongo: an empty $match matches every document
        return F.lit(True)
    conds: list[Column] = []
    for field_name, cond in spec.items():
        col = F.col(field_name)
        if isinstance(cond, dict):
            for op, val in cond.items():
                if op == "$exists":
                    conds.append(col.isNotNull() if val else col.isNull())
                elif op in _MATCH_OPS:
                    conds.append(_MATCH_OPS[op](col, val))
                else:
                    raise ValueError(f"unsupported $match operator {op!r}")
        else:
            conds.append(col == F.lit(cond))
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _apply_project(df: DataFrame, spec: dict, doc_key: str) -> DataFrame:
    includes = [k for k, v in spec.items() if v in (1, True)]
    # Mongo expression context: a string starting with "$" is a FIELD PATH
    # ({title: "$Title"} copies the Title field); any other string is a
    # literal — treating paths as literals would silently inject the
    # constant text "$Title" into every document
    paths = {k: v[1:] for k, v in spec.items()
             if isinstance(v, str) and v.startswith("$")}
    literals = {k: v for k, v in spec.items()
                if isinstance(v, str) and not isinstance(v, bool)
                and k not in paths}
    excludes = [k for k, v in spec.items() if v in (0, False)]
    unsupported = {k: v for k, v in spec.items()
                   if k not in includes and k not in literals
                   and k not in paths and k not in excludes}
    if unsupported:
        # a silently-dropped numeric/dict literal would ship a config whose
        # injected field simply vanishes — fail loudly instead
        raise ValueError(
            f"unsupported $project values {unsupported!r}: supported are "
            "1/true (include), 0/false (exclude), \"$field\" paths, and "
            "string literals")
    if includes or literals or paths:
        cols: list[Column] = []
        # hidden $lookup join keys must survive a sub-pipeline's $project
        cols.extend(F.col(c) for c in df.columns if c.startswith("__fk"))
        if doc_key in df.columns and doc_key not in excludes and \
                doc_key not in includes and doc_key not in literals \
                and doc_key not in paths:
            cols.append(F.col(doc_key))
        for k in spec:          # preserve the config's field order
            if k in literals:
                cols.append(F.lit(literals[k]).alias(k))
            elif k in paths:
                cols.append(F.col(paths[k]).alias(k))
            elif k in includes and k in df.columns:
                cols.append(F.col(k))
        return df.select(*cols)
    if excludes:
        return df.drop(*[c for c in excludes if c in df.columns])
    return df


# distinct hidden-key names per $lookup invocation: DataFrame.drop(name)
# drops EVERY column with that name, so a nested scalar lookup sharing
# "__fk" with its parent would drop the parent's join key mid-pipeline
# (AnalysisException UNRESOLVED_COLUMN on the outer groupBy)
_FK_SEQ = __import__("itertools").count()


def _apply_lookup(df: DataFrame, spec: dict,
                  resolver: Callable[[str], DataFrame], doc_key: str,
                  broadcast_child: bool) -> DataFrame:
    from pyspark.sql.types import ArrayType

    child = resolver(spec["from"])
    local, foreign, as_field = spec["localField"], spec["foreignField"], spec["as"]
    fk = f"__fk{next(_FK_SEQ)}"
    # keep a hidden fk: the sub-pipeline may project the foreignField away,
    # but the join key must survive it (Mongo matches before the pipeline's
    # $project is applied to the matched docs)
    child = child.withColumn(fk, F.col(foreign))
    sub = spec.get("pipeline") or []
    child = compile_pipeline(child, sub, resolver, doc_key=doc_key,
                             broadcast_children=broadcast_child)
    visible = [c for c in child.columns if not c.startswith("__fk")]
    agg = (child.groupBy(fk)
           .agg(F.array_sort(F.collect_list(F.struct(*visible))).alias(as_field)))
    if broadcast_child:
        agg = F.broadcast(agg)
    arr_type = agg.schema[as_field].dataType
    empty = F.array().cast(arr_type)

    local_is_array = isinstance(df.schema[local].dataType, ArrayType) \
        if local in df.columns else False
    if not local_is_array:
        out = df.join(agg, df[local] == agg[fk], "left").drop(fk)
        return out.withColumn(as_field, F.coalesce(F.col(as_field), empty))
    # array localField: foreign docs matching ANY element, each once —
    # explode(distinct) keyed by the parent doc key, then re-aggregate so
    # the parent row count is preserved
    if doc_key not in df.columns:
        raise ValueError(
            f"$lookup with array localField {local!r} needs the parent key "
            f"column {doc_key!r} to re-aggregate")
    pairs = df.select(F.col(doc_key).alias("__pk"),
                      F.explode(F.array_distinct(F.col(local))).alias("__el"))
    matched = (pairs.join(agg, pairs["__el"] == agg[fk], "inner")
               .groupBy("__pk")
               .agg(F.array_sort(F.flatten(F.collect_list(as_field))).alias(as_field)))
    out = df.join(matched, df[doc_key] == matched["__pk"], "left").drop("__pk")
    return out.withColumn(as_field, F.coalesce(F.col(as_field), empty))


def compile_pipeline(source: DataFrame, pipeline: list[dict] | tuple,
                     resolver: Callable[[str], DataFrame],
                     doc_key: str = "_id",
                     broadcast_children: bool = True) -> DataFrame:
    """Compile a Mongo-shaped aggregation pipeline onto ``source``.

    ``resolver`` maps a ``$lookup.from`` collection name to its DataFrame
    (a catalog read on a cluster).  ``doc_key`` is the document identity
    column (Mongo ``_id``); it anchors array-localField lookups and the
    implicit keep-in-$project rule.  ``broadcast_children=False`` turns
    every lookup into a shuffled join for child tables too big to
    broadcast (flip per config when a dimension outgrows the driver).
    """
    df = source
    for stage in pipeline:
        if len(stage) != 1:
            raise ValueError(f"pipeline stage must have exactly one key: {stage}")
        (op, spec), = stage.items()
        if op == "$match":
            df = df.filter(_match_condition(spec))
        elif op == "$project":
            df = _apply_project(df, spec, doc_key)
        elif op == "$lookup":
            df = _apply_lookup(df, spec, resolver, doc_key, broadcast_children)
        else:
            raise ValueError(f"unsupported pipeline stage {op!r} "
                             "(supported: $match, $project, $lookup)")
    return df
