"""Per-partition lineage / checkpoint protocol for resumable index builds.

Reference analog: the indexer stores progress *in the data* via
``lastESIndexedAt`` watermark writebacks (load.service.ts:397-408) and
stream offsets in a ``resume_tokens`` index (load.service.ts:55-69,
430-440), so a restart resumes where it left off.  The engine keeps the
same property without mutating source rows (north rule): every build stage
records completion + metrics rows keyed by (stage, partition); a re-run
skips work whose lineage row exists.

Storage is one small JSON file per (stage, partition) under
``<index_dir>/_lineage/`` — written executor-side with atomic rename, so
task retries / speculative duplicates cannot corrupt state (last writer
wins with identical content).  On a cluster this directory lives on the
shared FS next to the index tables; pass a pyarrow ``filesystem`` to
write/read it through S3/HDFS (sources.fsio seam).
"""

from __future__ import annotations

import json
import os

from ..sources import fsio


class Lineage:
    def __init__(self, index_dir: str, filesystem=None):
        self.root = os.path.join(index_dir, "_lineage")
        self.fs = filesystem
        fsio.makedirs(self.root, filesystem)

    # -- paths ---------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _part_path(self, stage: str, partition: str) -> str:
        return os.path.join(self._stage_dir(stage), f"part-{partition}.json")

    # thin wrappers over the one filesystem seam (sources.fsio) — lineage
    # must not carry a second copy of the FS-dispatch logic
    def _read_json(self, path: str) -> dict:
        return json.loads(fsio.read_text(path, self.fs))

    def _listdir(self, path: str) -> list[str]:
        # [] for missing AND non-directory paths (a stray file where a
        # stage dir should be must read as "no completed partitions",
        # not abort the resume scan)
        if not fsio.is_dir(path, self.fs):
            return []
        return fsio.listdir(path, self.fs)

    def _exists(self, path: str) -> bool:
        return fsio.exists(path, self.fs)

    # -- executor-side: per-partition rows ------------------------------------
    def mark_partition(self, stage: str, partition: str, **metrics) -> None:
        fsio.makedirs(self._stage_dir(stage), self.fs)
        fsio.write_text_atomic(
            json.dumps({"stage": stage, "partition": partition,
                        "status": "done", **metrics}),
            self._part_path(stage, partition), self.fs)

    def done_partitions(self, stage: str) -> set[str]:
        out = set()
        for fn in self._listdir(self._stage_dir(stage)):
            if fn.startswith("part-") and fn.endswith(".json"):
                out.add(fn[len("part-"):-len(".json")])
        return out

    # -- driver-side: stage completion ----------------------------------------
    def mark_stage(self, stage: str, **metrics) -> None:
        fsio.makedirs(self._stage_dir(stage), self.fs)
        fsio.write_text_atomic(
            json.dumps({"stage": stage, "status": "complete", **metrics}),
            os.path.join(self._stage_dir(stage), "_COMPLETE.json"), self.fs)

    def stage_complete(self, stage: str) -> bool:
        return self._exists(
            os.path.join(self._stage_dir(stage), "_COMPLETE.json"))

    # -- reporting (ST8 parity: progress/metrics) ------------------------------
    def rows(self) -> list[dict]:
        out = []
        for stage in sorted(fsio.list_subdirs(self.root, self.fs)):
            d = os.path.join(self.root, stage)
            for fn in sorted(self._listdir(d)):
                if fn.endswith(".json"):
                    out.append(self._read_json(os.path.join(d, fn)))
        return out

    def reset(self, stage: str | None = None) -> None:
        target = self.root if stage is None else self._stage_dir(stage)
        fsio.remove_dir(target, self.fs)
        if stage is None:
            fsio.makedirs(self.root, self.fs)
