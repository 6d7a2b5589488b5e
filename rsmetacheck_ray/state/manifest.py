"""Checkpoint manifest — resume-by-partition state (SURVEY §4 row
"Checkpoint / resume").

The reference recomputes everything on re-run (its only idempotence is
overwrite-by-filename, ``utils/json_ld_utils.py:503-510``). Here a runs
directory carries a JSONL manifest of completed partition ids; on
resume the driver filters the partition list against it BEFORE building
any Dataset — no distributed state, no shuffle (SURVEY §2.5: small side
⇒ driver-side filter on the fragment list).

Output directories are written atomically (temp dir + rename) so a
partition is either fully present or absent; the manifest line is
appended with fsync only after the rename.
"""

from __future__ import annotations

import json
import os


class Manifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def completed(self) -> dict[int, dict]:
        """partition_id → manifest record for every completed partition."""
        done: dict[int, dict] = {}
        if not os.path.exists(self.path):
            return done
        with open(self.path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail write from a killed run — ignore
                done[int(rec["partition_id"])] = rec
        return done

    def mark_done(self, partition_id: int, fragment_ids: list[str], stats: dict) -> None:
        rec = {"partition_id": partition_id, "fragment_ids": fragment_ids, **stats}
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
