"""Relational operators mirroring the reference's Mongo aggregation surface.

The reference's configs are aggregation pipelines of $lookup / $match /
$project (SURVEY §2.2-2.3); Mongo executes them server-side.  Here each is
a DataFrame composition Catalyst can optimize (pushdown, broadcast, AQE):

* ``lookup`` — $lookup equi-join semantics (J1/J2): LEFT join + group to an
  array field; missing FK → empty array; child sub-pipeline (filter/
  projection) applied before the join.  The reference's ``fetchSeparate``
  per-row nested-loop variant (extract.service.ts:89-131, a 16 MB BSON
  workaround) is deliberately NOT ported — a shuffled join has no row-size
  ceiling (SURVEY §7.4).
* ``anti_join_new`` — the migrate script's dedup anti-join (J5,
  migrate-ltd-docs.js:59-66) and the "never indexed" poll predicate (P5,
  load.service.ts:507-511).
* ``stale_docs`` — the "updated since last index" predicate (P6,
  load.service.ts:543-549).
* ``changed_fields_subset`` — the self-update loop-breaker (P7,
  array-utils.ts:6-13): skip rows whose changed fields ⊆ excluded set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup(parent: DataFrame, child: DataFrame, local_field: str,
           foreign_field: str, as_field: str,
           child_filter: Column | None = None,
           child_project: list[str] | None = None,
           broadcast_child: bool = True) -> DataFrame:
    """Mongo ``$lookup`` as pre-aggregated child + LEFT join.

    Array elements are sorted (by their string form) for deterministic
    output — Mongo preserves child insertion order, which has no Spark
    analog; determinism is the engine's contract.

    The child is aggregated to ``(fk, array)`` BEFORE the join — never a
    groupBy over all parent columns, which would collapse fully-duplicate
    parent rows into one (Mongo keeps each document), fail outright on
    non-groupable parent types (maps), and shuffle the whole parent by
    every column.  Same strategy as plans.pipeline._apply_lookup.
    """
    c = child
    if child_filter is not None:
        c = c.filter(child_filter)
    if child_project:
        proj = list(dict.fromkeys(child_project + [foreign_field]))
        c = c.select(*proj)
    struct_cols = [f for f in c.columns]
    c = c.select(F.col(foreign_field).alias("__fk"),
                 F.struct(*[F.col(f) for f in struct_cols]).alias("__child"))
    agg = c.groupBy("__fk").agg(
        F.array_sort(F.collect_list("__child")).alias(as_field))
    if broadcast_child:
        agg = F.broadcast(agg)
    arr_type = agg.schema[as_field].dataType
    out = parent.join(agg, parent[local_field] == agg["__fk"], "left") \
        .drop("__fk")
    return out.withColumn(
        as_field, F.coalesce(F.col(as_field), F.array().cast(arr_type)))


def anti_join_new(source: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """Rows of ``source`` not present in ``done`` (never-indexed docs)."""
    return source.join(done.select(key), key, "left_anti")


def stale_docs(source: DataFrame, lineage: DataFrame, key: str,
               updated_col: str, indexed_col: str) -> DataFrame:
    """Rows updated at/after their last indexing time (needs re-index)."""
    return (
        source.join(lineage.select(key, indexed_col), key, "inner")
        .filter(F.col(updated_col) >= F.col(indexed_col))
        .drop(indexed_col)
    )


def migrate_append(source: DataFrame, target: DataFrame | None,
                   key: str) -> DataFrame:
    """Collection-to-collection copy with dedup (S11,
    migrate-ltd-docs.js:39-107): rows of ``source`` whose key is absent
    from ``target`` — the batch to append.

    The reference pages with keyset pagination (`_id > lastId` limit 100)
    and an in-memory `some()` per batch; here one anti-join covers the
    whole copy, and the partitioned scan IS the pagination.  Caller
    appends the result (`catalog.append` / `writeTo(...).append()`).
    """
    if target is None:
        return source
    return source.join(target.select(key).distinct(), key, "left_anti")


def changed_fields_subset(events: DataFrame, changed_col: str,
                          excluded: list[str]) -> Column:
    """True when every changed field is in the excluded set — such events
    are the indexer's own writebacks and must be skipped (P7)."""
    return F.size(F.array_except(
        F.col(changed_col), F.array(*[F.lit(x) for x in excluded])
    )) == 0
