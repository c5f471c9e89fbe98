"""Per-stage metrics extraction from Ray Data's `ds.stats()`.

"Measure, don't guess": after a pipeline materializes, pull a compact
per-operator table (name, wall seconds, output rows) from the stats
report — for run reports, manifests, and bench annotations. Parsing is
tolerant of Ray's formatting drift: anything unmatched is skipped, and
the raw text is returned alongside.
"""

from __future__ import annotations

import re
from typing import Dict, List

_OP_RE = re.compile(r"^Operator (\d+) (\S+):.*?executed in ([0-9.]+)s", re.M)
_OP_SPLIT_RE = re.compile(r"^Operator (\d+) (.+?):", re.M)
_ROWS_RE = re.compile(r"Output num rows per block:.*?, (\d+) total")


def summarize_stats(ds) -> Dict:
    """-> {"operators": [{"name", "wall_s"?, "rows"?}...], "raw": str}."""
    text = ds.stats()
    ops: List[Dict] = []
    blocks = _OP_SPLIT_RE.split(text)
    # blocks: [prefix, idx, name, body, idx, name, body, ...]
    for i in range(1, len(blocks) - 2, 3):
        name = blocks[i + 1].strip()
        body = blocks[i + 2]
        rec: Dict = {"name": name}
        m = re.search(r"executed in ([0-9.]+)s", body)
        if m:
            rec["wall_s"] = float(m.group(1))
        m = _ROWS_RE.search(body)
        if m:
            rec["rows"] = int(m.group(1))
        ops.append(rec)
    return {"operators": ops, "raw": text}
