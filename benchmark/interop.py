"""Interop artifact recorder: `python -m benchmark.interop`.

Runs the cross-implementation LZ4 check (frames produced here decoded by
python-lz4/liblz4 and vice versa) whenever a second LZ4 implementation is
importable, and writes the transcript to INTEROP.json at the repo root.
This image has no second implementation (no node, no lz4 CLI, no
python-lz4 — SURVEY §4), so the transcript records the golden-vector
anchor; the full check activates automatically the first time the module
runs in an environment that ships one.
"""

from __future__ import annotations

import json
import os
import platform
import sys

from .libs import run_interop_check


def main() -> int:
    result = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "check": run_interop_check(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "INTEROP.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
