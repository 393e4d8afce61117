"""mongoesindexer_spark — a PySpark-native full-text indexing + BM25 retrieval engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``saurabhg22/MongoESIndexer`` (a NestJS Mongo→Elasticsearch ETL
orchestrator).  The reference delegates all index/query semantics to
Elasticsearch; this engine implements them natively as PySpark DataFrame
jobs:

* analyzer chains (whitespace tokenize → lowercase → word_delimiter →
  edge_ngram → asciifolding → stop), byte-exact and golden-tested
  (reference: ``configs/ltd_doc.settings.json`` analysis section),
* term-partitioned inverted index (docID delta + varbyte compression,
  skip/block structure, per-block max-score metadata),
* BM25 (k1=1.2, b=0.75 — ES default similarity) top-k retrieval with
  block-max WAND pruning,
* log-structured segment merge + incremental (CDC-style) index sync
  (reference: change streams, ``src/indexer/load.service.ts:457-491``),
* per-partition lineage/checkpointing for resumable builds
  (reference analog: ``lastESIndexedAt`` watermarks,
  ``load.service.ts:397-408``).

Everything relational (scans, joins, filters, aggregations, top-k) is
declared through the DataFrame API so Catalyst handles pushdown/pruning;
custom kernels live in Arrow-vectorized pandas UDFs only.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
