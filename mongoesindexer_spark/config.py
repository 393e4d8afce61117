"""Engine configuration: the analog of the reference's Zod-validated JSON
configs (configuration.ts:3-24; one file per collection→index pair in
configs/).

A reference config carries: source collection, sink index name, the
aggregation pipeline (source query), analyzer settings, batch/refresh
policy (batch_size, skip_after_seconds, update_field, exclude_fields,
index_on_start, force_delete).  The engine keeps the same knobs where they
still mean something under Spark, and documents the ones Spark's execution
model removes (batch_size → Arrow batch/partition sizing; concurrency →
scheduler pools/executors).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from .functions.analysis import KEYWORD, LTD_DOC, AnalyzerConfig

# config keys that earlier engine versions defined; ignored on load so
# old config files stay valid (see IndexConfig.from_json)
_DEPRECATED_KEYS = {"docs_per_salt"}


@dataclass(frozen=True)
class IndexConfig:
    """One (source table → index) job description."""

    source_table: str                       # was: collection
    index_name: str                         # was: index_name
    key_col: str = "url"                    # document identity (was: _id)
    text_col: str = "text"
    id_col: str | None = None               # pre-assigned integer ids
    index_on_start: bool = True
    force_delete: bool = False              # drop + full rebuild
    update_field: str = "warc_ts"           # staleness column (was: updated)
    skip_after_seconds: int = 86_400        # freshness window
    exclude_fields: tuple[str, ...] = ()    # self-update loop-breaker (P7)
    analyzer: str = "ltd_docs"              # ltd_docs | keywords family
    # source parquet layout is already globally url-ordered (SORTED BY url):
    # skip the docs_sorted corpus rewrite (footer-validated)
    pre_sorted: bool = False
    n_buckets: int = 32
    block_size: int = 128
    # Mongo-shaped source pipeline ($match/$project/$lookup), executed over
    # the source table before indexing — the reference's
    # configuration-as-query surface (configuration.ts:17,
    # configs/cld_doc.config.json:9-140).  Compiled by plans.pipeline.
    aggregation_pipeline: tuple = ()
    doc_key: str = "_id"                    # document identity for $lookup
    # columns getting keyword/normalized sub-fields (T8: the reference's
    # text+keyword+normalize multi-field mappings,
    # ltd_doc.settings.json:292-310)
    keyword_fields: tuple[str, ...] = ()
    # columns getting <col>_num long doc values (ES integer/date
    # mappings) — serves range-filter context (topk.RangeClause)
    numeric_fields: tuple[str, ...] = ()
    # store within-doc term positions (ES index_options: positions — the
    # Lucene text-mapping default) — enables match_phrase serving
    index_positions: bool = False
    # index-time synonym groups (ES synonym token filter, expansion
    # form; single-token members) — e.g. [["fast", "quick"]]
    synonyms: tuple = ()

    def analyzer_config(self) -> AnalyzerConfig:
        base = KEYWORD if self.analyzer == "keywords" else LTD_DOC
        if self.synonyms:
            import dataclasses
            base = dataclasses.replace(
                base, synonyms=tuple(tuple(g) for g in self.synonyms))
        return base

    def apply_pipeline(self, source, resolver):
        """Run this config's aggregation_pipeline over ``source`` using
        ``resolver`` (collection name → DataFrame) for $lookup children."""
        from .plans.pipeline import compile_pipeline
        if not self.aggregation_pipeline:
            return source
        return compile_pipeline(source, list(self.aggregation_pipeline),
                                resolver, doc_key=self.doc_key)

    @classmethod
    def from_json(cls, path: str) -> "IndexConfig":
        with open(path) as f:
            raw = json.load(f)
        allowed = set(cls.__dataclass_fields__)
        # keys from superseded engine versions: accepted and ignored so
        # existing config files keep loading (docs_per_salt died with the
        # round-2 salted-shuffle encode; per-file encoding has no salt)
        for dep in _DEPRECATED_KEYS & set(raw):
            raw.pop(dep)
        unknown = set(raw) - allowed
        if unknown:
            raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
        if "exclude_fields" in raw:
            raw["exclude_fields"] = tuple(raw["exclude_fields"])
        if "aggregation_pipeline" in raw:
            raw["aggregation_pipeline"] = tuple(raw["aggregation_pipeline"])
        if "keyword_fields" in raw:
            raw["keyword_fields"] = tuple(raw["keyword_fields"])
        if "numeric_fields" in raw:
            raw["numeric_fields"] = tuple(raw["numeric_fields"])
        if "synonyms" in raw:
            raw["synonyms"] = tuple(tuple(g) for g in raw["synonyms"])
        cfg = cls(**raw)
        if not cfg.source_table or not cfg.index_name:
            raise ValueError(f"{path}: source_table and index_name are required")
        return cfg


def load_config_dir(config_dir: str) -> list[IndexConfig]:
    """Read + validate every ``*.json`` in a directory (init(configDir)
    parity, load.service.ts:52-96)."""
    out = []
    for fn in sorted(os.listdir(config_dir)):
        if fn.endswith(".json"):
            out.append(IndexConfig.from_json(os.path.join(config_dir, fn)))
    return out
