"""Round-result file parsing, shared by the driver-contract tests.

The driver writes ``CORRECTNESS_r{N}.json`` per round — zero-padded
two digits so far (r01..r09), three characters at round 10+ (r10).
Everything here parses the round with a regex (``_r(\\d+)\\.json$``)
and aggregates by the PARSED integer, never by filename order, so the
r09 → r10 rollover cannot corrupt the staleness baseline
(VERDICT r8 #8's dry run; pinned by
tests/test_driver_contract.py::test_round_parse_survives_round_10).
"""

from __future__ import annotations

import glob
import json
import os
import re

_ROUND_RE = re.compile(r"_r(\d+)\.json$")


def round_of(path: str) -> int | None:
    """Parsed round number of a CORRECTNESS file path, or None."""
    m = _ROUND_RE.search(path)
    return int(m.group(1)) if m else None


def last_green_map(repo_dir: str, cutoff: int) -> dict[str, int]:
    """query name → latest round ≤ ``cutoff`` with an all-green row
    (rows+schema+hash), across every CORRECTNESS_r*.json in
    ``repo_dir``. Files beyond the cutoff (the in-flight round) are
    ignored — the window-draw baseline contract."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        rnd = round_of(path)
        if rnd is None or rnd > cutoff:
            continue
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last
