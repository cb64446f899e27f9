"""Per-partition lineage manifest for checkpoint/resume.

At 100 TB a job WILL be preempted; output must be resumable without
recomputing finished work. The unit of resume is an input shard (a set of
parquet files hashed to a shard id). Each completed shard writes
``<out>/_manifest/shard-<id>.json`` with row counts and stage counters; a
restarted run skips shards whose manifest entry exists and is complete.
"""

from __future__ import annotations

import json
import os
import time


class RunManifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, shard_id: str) -> str:
        return os.path.join(self.dir, f"shard-{shard_id}.json")

    def is_done(self, shard_id: str) -> bool:
        path = self._path(shard_id)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                return json.load(f).get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False

    def mark_done(self, shard_id: str, counters: dict) -> None:
        record = {"status": "done", "shard": shard_id,
                  "finished_at": time.time(), **counters}
        tmp = self._path(shard_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, self._path(shard_id))

    def pending(self, shard_ids: list[str]) -> list[str]:
        return [s for s in shard_ids if not self.is_done(s)]

    def counters(self) -> dict:
        total: dict[str, float] = {}
        for name in os.listdir(self.dir):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.dir, name)) as f:
                    rec = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            for key, value in rec.items():
                if isinstance(value, (int, float)) and key != "finished_at":
                    total[key] = total.get(key, 0) + value
        return total
