"""Per-partition checkpoint manifest — resumable partitioned runs.

North-rule requirement: "streaming with per-partition checkpoints
carrying lineage and counters, so a killed run resumes without
recomputing completed cells." Reference pattern: `gdal raster tile
--resume` skips already-written tiles (`apps/gdalalg_raster_tile.cpp:280,
5867`) and gdal2tiles' resume mode; we add an explicit manifest with
lineage + counters (SURVEY.md §4 checkpoint row).

Protocol (crash-safe):
1. task writes partition output to `<out>/part=<key>.tmp-<nonce>`
2. atomic rename to `<out>/part=<key>` (idempotent commit)
3. task appends a manifest record `<out>/_manifest/<key>.json`
   (write temp + rename, after the data rename — so a manifest entry
   implies committed data; orphan tmp files are cleaned on resume)

`run_partitioned` drives a list of partition keys through a worker fn,
anti-joining against the completed set on restart.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Callable, Dict, Iterable, List, Optional


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.mdir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.mdir, exist_ok=True)

    def _mpath(self, key: str) -> str:
        return os.path.join(self.mdir, f"{key}.json")

    def commit(self, key: str, lineage: str, counters: Dict[str, float]) -> None:
        rec = {
            "partition": key,
            "lineage": lineage,
            "counters": counters,
            "ts": time.time(),
            "status": "done",
        }
        tmp = self._mpath(key) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._mpath(key))

    def completed(self, lineage: Optional[str] = None) -> Dict[str, dict]:
        """Committed partitions; if `lineage` given, only entries whose
        recorded lineage matches (input changed ⇒ recompute)."""
        out = {}
        if not os.path.isdir(self.mdir):
            return out
        for name in os.listdir(self.mdir):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.mdir, name)) as f:
                    rec = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue  # torn write — treated as not-committed
            if rec.get("status") == "done" and (lineage is None or rec.get("lineage") == lineage):
                out[rec["partition"]] = rec
        return out

    def pending(self, keys: Iterable[str], lineage: Optional[str] = None) -> List[str]:
        done = self.completed(lineage)
        return [k for k in keys if k not in done]

    def clean_orphans(self) -> int:
        """Remove uncommitted tmp outputs from a crashed run."""
        n = 0
        for root, _dirs, files in os.walk(self.out_dir):
            for f in files:
                if ".tmp-" in f:
                    os.unlink(os.path.join(root, f))
                    n += 1
        return n

    def counters_total(self) -> Dict[str, float]:
        total: Dict[str, float] = {}
        for rec in self.completed().values():
            for k, v in rec.get("counters", {}).items():
                total[k] = total.get(k, 0) + v
        return total


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def run_partitioned(out_dir: str, keys: List[str], lineage: str,
                    work: Callable[[str, str], Dict[str, float]],
                    fail_on: Optional[Callable[[str], bool]] = None) -> dict:
    """Run `work(key, out_path)` for every pending partition.

    work returns counters for the manifest. fail_on (tests only)
    injects a crash after some partitions to prove resume.
    Returns {"ran": [...], "skipped": [...]}.
    """
    man = Manifest(out_dir)
    man.clean_orphans()
    pending = man.pending(keys, lineage)
    skipped = [k for k in keys if k not in pending]
    ran = []
    for key in pending:
        if fail_on is not None and fail_on(key):
            raise RuntimeError(f"injected failure at partition {key}")
        out_path = os.path.join(out_dir, f"part={key}")
        counters = work(key, out_path)
        man.commit(key, lineage, counters)
        ran.append(key)
    return {"ran": ran, "skipped": skipped}
