"""B6 — structured per-op logging (SURVEY.md §2.4 B6, §5.5).

Reference observability is stdout phase prints (SURVEY.md §5.1); here every
operator execution in the bench path appends one JSON record
{op, rows_in, rows_out, bytes_moved, ms, ...} to an in-memory sink and
optionally a .jsonl file. Never called inside jit bodies — the runner
wraps dispatches (SURVEY.md §5.1 hook rule).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class OpLog:
    path: str | None = None
    records: list[dict] = field(default_factory=list)

    def emit(self, **record: Any) -> None:
        record.setdefault("t", time.time())
        self.records.append(record)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")


GLOBAL_LOG = OpLog()
