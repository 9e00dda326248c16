"""Per-partition lineage manifests and resumable output layout.

Generalizes the reference's checkpoint patterns — output-file-existence skip
(``/root/reference/experiments/wikiqa/_2_generate_kgs.py:127-129``) and the
incremental ``dedup_progress.json``
(``cluster_and_deduplication.py:303-331,444-464``) — into the standard batch
layout: one output directory per input shard, written atomically (temp dir
+ rename), plus a manifest JSON per partition recording input files, config
hash, row counts and stage metrics. A rerun skips every partition whose
manifest exists with a matching config hash; a changed config invalidates
all partitions (different stage semantics => different lineage).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionManifest:
    partition_id: int
    input_files: list
    config_hash: str
    row_counts: dict = field(default_factory=dict)   # stage -> rows
    metrics: dict = field(default_factory=dict)      # stage -> wall seconds etc.
    finished_at: float = 0.0

    def write(self, manifest_dir: str) -> str:
        os.makedirs(manifest_dir, exist_ok=True)
        path = os.path.join(manifest_dir, f"part-{self.partition_id:05d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2)
        os.replace(tmp, path)        # atomic on POSIX
        return path


def read_manifest(manifest_dir: str, partition_id: int):
    path = os.path.join(manifest_dir, f"part-{partition_id:05d}.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return PartitionManifest(**json.load(f))
    except (json.JSONDecodeError, TypeError):
        return None               # corrupt manifest == not completed


def is_complete(manifest_dir: str, partition_id: int, config_hash: str,
                input_files: list | None = None) -> bool:
    """A partition is complete only if config AND (when given) its input
    file set match the manifest — adding a shard re-shuffles the
    round-robin assignment, so a stale manifest for the same pid must NOT
    skip the re-extraction (silent data loss otherwise)."""
    m = read_manifest(manifest_dir, partition_id)
    if m is None or m.config_hash != config_hash:
        return False
    if input_files is not None and sorted(m.input_files) != sorted(input_files):
        return False
    return True


def atomic_output_dir(final_dir: str):
    """Context manager: yields a temp dir; renames to final_dir on success,
    removes on failure. A partition output either fully exists or not at all."""
    class _Ctx:
        def __enter__(self):
            self.tmp = final_dir + ".tmp"
            if os.path.exists(self.tmp):
                shutil.rmtree(self.tmp)
            os.makedirs(self.tmp, exist_ok=True)
            return self.tmp

        def __exit__(self, exc_type, exc, tb):
            if exc_type is None:
                if os.path.exists(final_dir):
                    shutil.rmtree(final_dir)
                os.replace(self.tmp, final_dir)
            else:
                shutil.rmtree(self.tmp, ignore_errors=True)
            return False

    return _Ctx()


def now() -> float:
    return time.time()
