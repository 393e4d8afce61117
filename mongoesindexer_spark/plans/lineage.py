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
shared FS next to the index tables.
"""

from __future__ import annotations

import json
import os
import uuid


class Lineage:
    def __init__(self, index_dir: str):
        self.root = os.path.join(index_dir, "_lineage")
        os.makedirs(self.root, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _part_path(self, stage: str, partition: str) -> str:
        return os.path.join(self._stage_dir(stage), f"part-{partition}.json")

    # -- executor-side: per-partition rows ------------------------------------
    def mark_partition(self, stage: str, partition: str, **metrics) -> None:
        d = self._stage_dir(stage)
        os.makedirs(d, exist_ok=True)
        p = self._part_path(stage, partition)
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "partition": partition,
                       "status": "done", **metrics}, f)
        os.replace(tmp, p)

    def done_partitions(self, stage: str) -> set[str]:
        d = self._stage_dir(stage)
        if not os.path.isdir(d):
            return set()
        out = set()
        for fn in os.listdir(d):
            if fn.startswith("part-") and fn.endswith(".json"):
                out.add(fn[len("part-"):-len(".json")])
        return out

    # -- driver-side: stage completion ----------------------------------------
    def mark_stage(self, stage: str, **metrics) -> None:
        os.makedirs(self._stage_dir(stage), exist_ok=True)
        p = os.path.join(self._stage_dir(stage), "_COMPLETE.json")
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "status": "complete", **metrics}, f)
        os.replace(tmp, p)

    def stage_complete(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._stage_dir(stage), "_COMPLETE.json"))

    # -- reporting (ST8 parity: progress/metrics) ------------------------------
    def rows(self) -> list[dict]:
        out = []
        for stage in sorted(os.listdir(self.root)) if os.path.isdir(self.root) else []:
            d = os.path.join(self.root, stage)
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".json"):
                    with open(os.path.join(d, fn)) as f:
                        out.append(json.load(f))
        return out

    def reset(self, stage: str | None = None) -> None:
        import shutil
        if stage is None:
            shutil.rmtree(self.root, ignore_errors=True)
            os.makedirs(self.root, exist_ok=True)
        else:
            shutil.rmtree(self._stage_dir(stage), ignore_errors=True)
