"""spark-submit entry points: build / query / sync / compact.

Usage (north rule: runs via spark-submit --py-files on a cluster):

  spark-submit --py-files engine.zip -m mongoesindexer_spark.cli build \
      --pages /path/pages_parquet --index /path/index [--config cfg.json]
  ... query  --index /path/index --q "terms here" --k 10 [--wand]
             [--phrase [--slop N]]           # ES match_phrase (positional index)
             [--filter lang:en --filter-normalized]  # ES bool must+filter
             [--filter-range n_chars:150:350]  # ES range filter context
             [--min-should M]                # ES minimum_should_match
             [--fuzzy AUTO|N]                # ES fuzzy term query
             [--wildcard]                    # ES wildcard (--q is a glob)
             [--must-not lang:en]            # ES bool.must_not exclusion
             [--must-not-exists tag]         # ES must_not exists (missing)
             (filter flags repeat + compose: the full ES bool conjunction)
             [--sqs]                         # ES simple_query_string (+a -b "c d")
  ... suggest --index /path/index --prefix "mer" --k 10   # completion (T7)
  ... suggest-phrase --index /path/index --q "table scal" [--size 3]
                     [--always] [--collate]  # ES phrase suggester
  ... keyword --index /path/index --field lang --value EN [--normalized]  # term query (T8)
  ... count  --index /path/index --q "terms"    # ES _count (full hit set)
  ... explain --index /path/index --q "terms" --doc 42  # ES _explain
  ... sync   --index /path/index --updates /path/updates_parquet --batch-id b1
  ... compact --index /path/index
  ... vacuum --index /path/index        # expire snapshots + orphan sweep
  ... status --index /path/index        # lineage / progress report (ST8)
  ... build-all --configs /path/configs_dir   # indexAll parity (S10/ST6)

Local smoke: python -m mongoesindexer_spark.cli build --pages ... --index ...
"""

from __future__ import annotations

import argparse
import json
import sys

from .config import IndexConfig
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mongoesindexer_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--pages", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--config")
    b.add_argument("--force-delete", action="store_true")
    b.add_argument("--fail-after", default="",
                   help="fault injection: encode partition tag like f000002")

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--wand", action="store_true")
    q.add_argument("--mode", default="or", choices=["or", "and"])
    q.add_argument("--phrase", action="store_true",
                   help="ES match_phrase (slop=0): the query terms must "
                        "occur contiguously; needs an index built with "
                        "index_positions (config: index_positions true)")
    q.add_argument("--after", default=None, metavar="SCORE,DOC_ID",
                   help="search_after cursor: the previous page's last "
                        "score,doc_id — returns the next k (deep paging)")
    q.add_argument("--filter-range", action="append", default=None,
                   metavar="FIELD:LO:HI",
                   help="ES range filter context over a numeric_fields "
                        "column: docs with LO <= <field> <= HI "
                        "(repeatable; all filter clauses AND together)")
    q.add_argument("--filter", action="append", default=None,
                   metavar="FIELD:VALUE[,VALUE…]",
                   help="ES bool filter context: restrict to docs whose "
                        "keyword sub-field equals one of the values "
                        "(non-scoring; repeatable — clauses AND)")
    q.add_argument("--slop", type=int, default=0,
                   help="with --phrase: in-order window slop (extra "
                        "tokens allowed between phrase terms)")
    q.add_argument("--phrase-prefix", action="store_true",
                   help="ES match_phrase_prefix: the LAST token of --q "
                        "is a prefix expanded against the term "
                        "dictionary (autocomplete-on-phrases); needs a "
                        "positional index")
    q.add_argument("--min-should", type=int, default=None, metavar="M",
                   help="ES minimum_should_match: docs must match ≥ M of "
                        "the query's term clauses (mode=or only)")
    q.add_argument("--fuzzy", default=None, metavar="AUTO|N",
                   help="ES fuzzy term query: expand --q against the term "
                        "dictionary within edit distance N (AUTO = ES "
                        "AUTO:3,6) and OR-BM25 the expansion set")
    q.add_argument("--wildcard", action="store_true",
                   help="ES wildcard query: --q is a */? glob; prints the "
                        "constant-score doc_id set containing a match")
    q.add_argument("--filter-normalized", action="store_true",
                   help="match the filter on <field>.normalized (values "
                        "folded through keyword/lowercase/asciifold)")
    q.add_argument("--must-not", action="append", default=None,
                   metavar="FIELD:VALUE[,VALUE…]",
                   help="ES bool.must_not: EXCLUDE docs whose keyword "
                        "sub-field equals one of the values (non-scoring "
                        "complement; docs missing the sub-field survive; "
                        "repeatable, composes with --filter/--filter-range)")
    q.add_argument("--must-not-exists", default=None, metavar="FIELD",
                   help="ES must_not exists: keep only docs MISSING the "
                        "sub-field's doc value")
    q.add_argument("--sqs", action="store_true",
                   help="ES simple_query_string: --q uses the operator "
                        "syntax (+must -not \"phrase\"); --mode sets "
                        "default_operator for bare tokens")
    q.add_argument("--filter-exists", action="append", default=None,
                   metavar="FIELD[:keyword|normalized|num]",
                   help="ES exists filter: keep only docs CARRYING a "
                        "non-null doc value for the sub-field "
                        "(repeatable; kind defaults to keyword)")

    sp = sub.add_parser("suggest-phrase",
                        help="ES phrase suggester: whole-input "
                             "did-you-mean, single-slot corrections "
                             "ranked by a Stupid-Backoff bigram model "
                             "from positional postings (Q35)")
    sp.add_argument("--index", required=True)
    sp.add_argument("--q", required=True)
    sp.add_argument("--size", type=int, default=3)
    sp.add_argument("--max-edits", type=int, default=2)
    sp.add_argument("--always", action="store_true",
                    help="suggest_mode=always: correct in-vocabulary "
                         "slots too (real-word errors); default only "
                         "out-of-vocabulary slots")
    sp.add_argument("--collate", action="store_true",
                    help="keep only suggestions whose corrected bigrams "
                         "occur in the corpus")

    sg = sub.add_parser("suggest",
                        help="completion suggester (T7): top-k terms for "
                             "a prefix, weighted by doc frequency")
    sg.add_argument("--index", required=True)
    sg.add_argument("--prefix", required=True)
    sg.add_argument("--k", type=int, default=10)

    kw = sub.add_parser("keyword",
                        help="ES term query on a keyword sub-field (T8), "
                             "served by point read — no Spark scan job")
    kw.add_argument("--index", required=True)
    kw.add_argument("--field", required=True)
    kw.add_argument("--value", required=True)
    kw.add_argument("--normalized", action="store_true",
                    help="match on <field>.normalized (query value folded "
                         "through the same keyword/lowercase/asciifold "
                         "analyzer)")
    kw.add_argument("--size", type=int, default=10)
    kw.add_argument("--after", type=int, default=None, metavar="DOC_ID",
                    help="paging cursor: return only doc_ids strictly "
                         "greater (the search_after analog for term "
                         "queries; doc_id asc is the total order)")

    ml = sub.add_parser("mlt",
                        help="ES more_like_this: docs similar to one doc "
                             "(tf-idf term selection + should query, "
                             "seed excluded)")
    ml.add_argument("--index", required=True)
    ml.add_argument("--pages", required=True,
                    help="_source parquet carrying (doc_id, text)")
    ml.add_argument("--doc", type=int, required=True)
    ml.add_argument("--k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=25)
    ml.add_argument("--min-term-freq", type=int, default=1)
    ml.add_argument("--min-doc-freq", type=int, default=1)

    rs = sub.add_parser("rescore",
                        help="ES rescore: re-rank the match query's top "
                             "window with a match_phrase rescorer")
    rs.add_argument("--index", required=True)
    rs.add_argument("--q", required=True)
    rs.add_argument("--rescore-q", required=True,
                    help="the phrase rescorer text")
    rs.add_argument("--k", type=int, default=10)
    rs.add_argument("--window", type=int, default=100)
    rs.add_argument("--query-weight", type=float, default=1.0)
    rs.add_argument("--rescore-weight", type=float, default=1.0)
    rs.add_argument("--score-mode", default="total",
                    choices=["total", "multiply", "max", "min", "avg"])
    rs.add_argument("--slop", type=int, default=0)

    cn = sub.add_parser("count",
                        help="ES _count: number of docs matching the "
                             "query (full hit set, not top-k)")
    cn.add_argument("--index", required=True)
    cn.add_argument("--q", required=True)
    cn.add_argument("--mode", default="or", choices=["or", "and"])

    ex = sub.add_parser("explain",
                        help="ES _explain: per-term BM25 score breakdown "
                             "for one doc")
    ex.add_argument("--index", required=True)
    ex.add_argument("--q", required=True)
    ex.add_argument("--doc", type=int, required=True)

    s = sub.add_parser("sync")
    s.add_argument("--index", required=True)
    s.add_argument("--updates", required=True)
    s.add_argument("--batch-id", default=None)
    s.add_argument("--config")

    po = sub.add_parser("poll",
                        help="one cron-poll tick: index new + stale docs "
                             "(EP3, load.service.ts:501-573)")
    po.add_argument("--index", required=True)
    po.add_argument("--pages", required=True)
    po.add_argument("--indexed", required=True,
                    help="parquet writeback table (key, last_indexed_at)")
    po.add_argument("--config")
    po.add_argument("--batch-id", default=None)

    c = sub.add_parser("compact")
    c.add_argument("--index", required=True)

    v = sub.add_parser("vacuum",
                       help="expire superseded snapshots + remove orphan "
                            "dirs (Iceberg expire_snapshots analog)")
    v.add_argument("--index", required=True)

    st = sub.add_parser("status")
    st.add_argument("--index", required=True)

    ba = sub.add_parser("build-all")
    ba.add_argument("--configs", required=True,
                    help="directory of per-index JSON configs")
    ba.add_argument("--index-root", default=".",
                    help="indexes land at <index-root>/<index_name>")

    args = p.parse_args(argv)
    spark = get_spark(f"mei-{args.cmd}")

    if args.cmd == "build":
        from .operators.build_index import IndexBuilder
        cfg = IndexConfig.from_json(args.config) if args.config else IndexConfig(
            source_table=args.pages, index_name=args.index)
        if args.force_delete or cfg.force_delete:
            import shutil
            shutil.rmtree(args.index, ignore_errors=True)
        builder = IndexBuilder(
            args.index, cfg=cfg.analyzer_config(), n_buckets=cfg.n_buckets,
            block_size=cfg.block_size,
            key_col=cfg.key_col, text_col=cfg.text_col, id_col=cfg.id_col,
            keyword_fields=cfg.keyword_fields,
            numeric_fields=cfg.numeric_fields, pre_sorted=cfg.pre_sorted,
            index_positions=cfg.index_positions)
        fail = frozenset({args.fail_after}) if args.fail_after else frozenset()
        res = builder.build(spark, spark.read.parquet(args.pages), fail_partitions=fail)
        print(json.dumps(res))
    elif args.cmd == "query":
        from .operators.topk import bm25_topk_df, bm25_topk_wand
        after = None
        if args.after:
            s, d = args.after.split(",")
            after = (float(s), int(d))
        # every --filter/--filter-range/--must-not[-exists] becomes one
        # clause in the ES bool conjunction (repeatable flags)
        from .operators.topk import (ExistsClause, MustNotClause,
                                     RangeClause)
        clauses = []
        for spec in (args.filter or []):
            f, _, vals = spec.partition(":")
            if not _ or not vals:
                raise SystemExit("--filter wants FIELD:VALUE[,VALUE…]")
            clauses.append((f, vals.split(","), args.filter_normalized))
        for spec in (args.filter_range or []):
            try:
                f, lo, hi = spec.split(":")
                clauses.append((f, RangeClause(int(lo), int(hi))))
            except ValueError:
                raise SystemExit("--filter-range wants FIELD:LO:HI")
        for spec in (args.must_not or []):
            f, _, vals = spec.partition(":")
            if not _ or not vals:
                raise SystemExit("--must-not wants FIELD:VALUE[,VALUE…]")
            clauses.append((f, MustNotClause(vals.split(",")),
                            args.filter_normalized))
        for spec in (args.filter_exists or []):
            f, _, kind = spec.partition(":")
            clauses.append((f, ExistsClause(kind=kind or "keyword")))
        if args.must_not_exists:
            clauses.append((args.must_not_exists,
                            MustNotClause(ExistsClause())))
        flts = clauses or None
        ff = "_" if flts else None   # sentinel: some serving guards below
        if args.sqs:
            if (flts is not None or args.min_should is not None
                    or args.after or args.phrase or args.wildcard
                    or args.fuzzy is not None):
                raise SystemExit(
                    "--sqs carries its own operators; it composes with "
                    "none of --filter*/--must-not*/--min-should/--after/"
                    "--phrase/--wildcard/--fuzzy")
            from .operators.query_string import simple_query_string_topk
            pdf = simple_query_string_topk(spark, args.index, args.q,
                                           args.k,
                                           default_operator=args.mode)
            print(pdf.to_string(index=False,
                                float_format=lambda v: f"{v:.17g}"))
        elif args.wildcard:
            # constant-score doc set: none of the scoring-path flags apply
            if (ff is not None or args.min_should is not None
                    or args.after or args.mode != "or"
                    or args.fuzzy is not None):
                raise SystemExit(
                    "--wildcard composes with none of --filter/"
                    "--filter-range/--min-should/--after/--mode/--fuzzy")
            from .operators.expand import wildcard_match
            pdf = wildcard_match(spark, args.index, args.q)
            print(pdf.to_string(index=False))
        elif args.fuzzy is not None:
            if args.mode != "or" or args.min_should is not None:
                raise SystemExit("--fuzzy is an OR query over the "
                                 "expansion set; --mode/--min-should "
                                 "don't apply")
            from .operators.expand import fuzzy_topk
            fz = "AUTO" if args.fuzzy.upper() == "AUTO" else int(args.fuzzy)
            pdf = fuzzy_topk(spark, args.index, args.q, args.k, fuzziness=fz,
                             search_after=after, filters=flts)
            print(pdf.to_string(index=False,
                                float_format=lambda v: f"{v:.17g}"))
        elif args.phrase_prefix:
            if (args.min_should is not None or ff is not None
                    or args.after or args.phrase):
                raise SystemExit(
                    "--phrase-prefix composes with none of --phrase/"
                    "--filter/--filter-range/--min-should/--after")
            from .operators.topk import get_engine
            pdf = get_engine(spark, args.index).phrase_prefix_topk(
                args.q, args.k)
            print(pdf.to_string(index=False,
                                float_format=lambda v: f"{v:.17g}"))
        elif args.phrase:
            if args.min_should is not None:
                raise SystemExit("--min-should does not apply to --phrase")
            from .operators.topk import bm25_phrase_topk
            pdf = bm25_phrase_topk(spark, args.index, args.q, args.k,
                                   search_after=after, filters=flts,
                                   slop=args.slop)
            print(pdf.to_string(index=False,
                                float_format=lambda v: f"{v:.17g}"))
        elif args.wand:
            pdf = bm25_topk_wand(spark, args.index, args.q, args.k,
                                 mode=args.mode, search_after=after,
                                 filters=flts,
                                 min_should_match=args.min_should)
            # full-precision scores: --after round-trips the printed value,
            # and a rounded cursor re-admits the boundary doc
            print(pdf.to_string(index=False,
                                float_format=lambda v: f"{v:.17g}"))
        else:
            bm25_topk_df(spark, args.index, args.q, args.k, mode=args.mode,
                         search_after=after, filters=flts,
                         min_should_match=args.min_should
                         ).show(args.k, truncate=False)
    elif args.cmd == "mlt":
        from .operators.mlt import more_like_this_topk
        pdf = more_like_this_topk(
            spark, args.index, spark.read.parquet(args.pages), args.doc,
            args.k, max_query_terms=args.max_terms,
            min_term_freq=args.min_term_freq,
            min_doc_freq=args.min_doc_freq)
        print(pdf.to_string(index=False,
                            float_format=lambda v: f"{v:.17g}"))
    elif args.cmd == "rescore":
        from .operators.rescore import rescore_topk
        pdf = rescore_topk(spark, args.index, args.q, args.rescore_q,
                           args.k, window_size=args.window,
                           query_weight=args.query_weight,
                           rescore_query_weight=args.rescore_weight,
                           score_mode=args.score_mode, slop=args.slop)
        print(pdf.to_string(index=False,
                            float_format=lambda v: f"{v:.17g}"))
    elif args.cmd == "count":
        from .operators.aggs import search_count
        from .operators.topk import get_engine
        n = search_count(get_engine(spark, args.index), args.q,
                         mode=args.mode).collect()[0]["doc_count"]
        print(json.dumps({"count": int(n)}))
    elif args.cmd == "explain":
        from .operators.topk import get_engine
        pdf = get_engine(spark, args.index).explain(args.q, args.doc)
        print(pdf.to_string(index=False,
                            float_format=lambda v: f"{v:.17g}"))
    elif args.cmd == "suggest":
        from .operators.topk import get_engine
        pdf = get_engine(spark, args.index).suggest(args.prefix, args.k)
        print(pdf.to_string(index=False))
    elif args.cmd == "suggest-phrase":
        from .operators.suggest import phrase_suggest
        pdf = phrase_suggest(
            spark, args.index, args.q, size=args.size,
            max_edits=args.max_edits,
            suggest_mode="always" if args.always else "missing",
            collate=args.collate)
        print(pdf.to_string(index=False,
                            float_format=lambda v: f"{v:.17g}"))
    elif args.cmd == "keyword":
        from .operators.topk import get_engine
        pdf = get_engine(spark, args.index).keyword_term(
            args.field, args.value, normalized=args.normalized,
            size=args.size, after_doc_id=args.after)
        print(pdf.to_string(index=False))
    elif args.cmd == "sync":
        from .functions.analysis import LTD_DOC
        from .streaming.incremental import IncrementalIndexer
        cfg = IndexConfig.from_json(args.config) if args.config else None
        indexer = IncrementalIndexer(
            args.index, cfg=cfg.analyzer_config() if cfg else LTD_DOC,
            exclude_fields=cfg.exclude_fields if cfg else ())
        res = indexer.apply_updates(
            spark, spark.read.parquet(args.updates), batch_id=args.batch_id)
        print(json.dumps(res))
    elif args.cmd == "poll":
        import os as _os
        from .streaming.incremental import (IncrementalIndexer, poll_updates,
                                            writeback_indexed)
        cfg = IndexConfig.from_json(args.config) if args.config else IndexConfig(
            source_table=args.pages, index_name=args.index)
        have_indexed = _os.path.exists(args.indexed)
        indexed_df = (spark.read.parquet(args.indexed) if have_indexed
                      else spark.createDataFrame(
                          [], f"{cfg.key_col} string, last_indexed_at timestamp"))
        batch = poll_updates(
            spark.read.parquet(args.pages), indexed_df,
            key=cfg.key_col, update_field=cfg.update_field,
            skip_after_seconds=cfg.skip_after_seconds)
        # pin the tick's keys BEFORE applying: the writeback below rewrites
        # the indexed table the batch plan reads from
        keys = [r[0] for r in batch.select(cfg.key_col).distinct().collect()]
        indexer = IncrementalIndexer(args.index, cfg=cfg.analyzer_config(),
                                     exclude_fields=cfg.exclude_fields)
        res = indexer.apply_updates(spark, batch, batch_id=args.batch_id)
        if res.get("applied"):
            # reference parity: lastESIndexedAt writeback after indexing —
            # the cron loop only advances through the backlog because of it
            res["writeback_keys"] = writeback_indexed(
                spark, args.indexed, keys, key=cfg.key_col)
        print(json.dumps(res))
    elif args.cmd == "compact":
        from .operators.merge import compact
        print(json.dumps(compact(spark, args.index)))
    elif args.cmd == "vacuum":
        from .operators.vacuum import vacuum_index
        print(json.dumps(vacuum_index(spark, args.index)))
    elif args.cmd == "build-all":
        # indexAll parity (load.service.ts:108-138): one build per config.
        # The reference throttles 3 collections via Bottleneck (ST6); on
        # Spark the executor pool is the concurrency knob, so configs run
        # sequentially, each using the whole cluster — same total work,
        # no cross-job memory contention.
        import os as _os
        import shutil as _shutil
        from .config import load_config_dir
        from .operators.build_index import IndexBuilder
        out = {}
        for cfg in load_config_dir(args.configs):
            # reference parity: indexAll only builds configs with
            # index_on_start true (load.service.ts:120-122)
            if not cfg.index_on_start:
                out[cfg.index_name] = {"skipped": "index_on_start=false"}
                continue
            # index_name is used as a path component under index_root —
            # reject separators/'..'/absolute names before any rmtree
            if (_os.path.isabs(cfg.index_name) or _os.sep in cfg.index_name
                    or (_os.altsep and _os.altsep in cfg.index_name)
                    or cfg.index_name in ("", ".", "..")):
                raise ValueError(
                    f"unsafe index_name {cfg.index_name!r}: must be a bare "
                    "directory name (no path separators or '..')")
            idx = _os.path.join(args.index_root, cfg.index_name)
            if cfg.force_delete:
                _shutil.rmtree(idx, ignore_errors=True)
            builder = IndexBuilder(
                idx, cfg=cfg.analyzer_config(), n_buckets=cfg.n_buckets,
                block_size=cfg.block_size,
                key_col=cfg.key_col, text_col=cfg.text_col, id_col=cfg.id_col,
                keyword_fields=cfg.keyword_fields,
            numeric_fields=cfg.numeric_fields, pre_sorted=cfg.pre_sorted,
                index_positions=cfg.index_positions)
            out[cfg.index_name] = builder.build(
                spark, spark.read.parquet(cfg.source_table))
        print(json.dumps(out))
    elif args.cmd == "status":
        from .plans.lineage import Lineage
        from .sources.catalog import ParquetCatalog, read_table_arrow
        rows = Lineage(args.index).rows()
        out = {"rows": rows, "partitions_done":
               sum(1 for r in rows if r.get("partition"))}
        # index-health summary (ST8): all driver-side pyarrow metadata
        # reads — no Spark job, safe against a serving index
        cat = ParquetCatalog(args.index)
        tables = cat.list_tables()
        out["tables"] = {t: cat.current_snapshot(t) for t in tables}
        if "global_stats" in tables:
            g = read_table_arrow(cat, "global_stats")
            if len(g):
                out["n_docs"] = int(g.iloc[0]["n_docs"])
                out["avgdl"] = round(float(g.iloc[0]["avgdl"] or 0.0), 3)
        if "tombstones" in tables:
            out["tombstones"] = int(len(read_table_arrow(cat, "tombstones")))
        if "sync_log" in tables:
            out["sync_batches"] = int(len(read_table_arrow(cat, "sync_log")))
        import os as _os
        from .sources import fsio as _fsio
        out["segment_files"] = sum(
            sum(1 for f in _fsio.listdir(d)
                if f.endswith(".parquet") and not f.startswith("."))
            for d in (cat._live_dirs("postings_blocks")
                      if "postings_blocks" in tables else []))
        out["pending_sync_journal"] = _os.path.exists(
            _os.path.join(args.index, "_sync_journal.json"))
        print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
