"""Restartable tracking offsets (the reference's EtlPosition table,
tracking.go:12-109).

One TrackingStatus row per (source_database, source_table):
column_name, sequential_position (int64), timestamp_position, last_run.

Storage is a JSON file per key under a tracking directory, written
atomically (tmp + os.replace). This is driver-side bookkeeping for a
single scalar per table — a Spark job would be overkill; the JSON file
plays the role of Structured Streaming's offset log. The important
semantic — the fix over the reference (SURVEY.md §2.11): the runner
commits the advanced offset only AFTER the loader has committed, so a
failed load replays the batch instead of losing it (at-least-once +
idempotent merge = effectively-once).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass
from datetime import datetime, timezone


@dataclass
class TrackingStatus:
    source_database: str
    source_table: str
    column_name: str = ""
    sequential_position: int = 0
    timestamp_position: str | None = None  # ISO-8601, like NullTime's RFC3339
    last_run: str | None = None

    @property
    def timestamp_position_dt(self) -> datetime | None:
        if self.timestamp_position is None:
            return None
        return datetime.fromisoformat(self.timestamp_position)


class TrackingStore:
    """File-backed tracking table; one JSON doc per (db, table)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, db: str, table: str) -> str:
        safe = f"{db}__{table}".replace("/", "_")
        return os.path.join(self.root, f"{safe}.json")

    def get(self, db: str, table: str, column: str = "") -> TrackingStatus:
        """Read current status; seeds a zero-position row if absent
        (mirrors migrator.go:249-257 SerializeNewTrackingStatus)."""
        p = self._path(db, table)
        if os.path.exists(p):
            with open(p) as f:
                return TrackingStatus(**json.load(f))
        return TrackingStatus(source_database=db, source_table=table, column_name=column)

    def put(self, ts: TrackingStatus) -> None:
        ts.last_run = datetime.now(timezone.utc).isoformat()
        p = self._path(ts.source_database, ts.source_table)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(ts), f)
        os.replace(tmp, p)

    def all(self) -> list[TrackingStatus]:
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    out.append(TrackingStatus(**json.load(f)))
        return out
