#!/usr/bin/env python
"""Exploration demo: run the deepmind_code_contests formatter on fixture
rows and print the resulting chat structure.

Analog of the reference's ``scripts/EDA/extract_deepmind_format.py``
(manual formatter exploration), pointed at the offline fixture dataset so
it runs on a zero-egress box.

    python examples/explore_code_contests_format.py [n_rows]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from quantizers_tpu.data.formatters import get_formatter  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    repo = Path(__file__).resolve().parent.parent
    fixture = repo / "tests" / "fixtures" / "code_contests" / "dataset.json"
    if not fixture.exists():  # older fixture name
        candidates = list((repo / "tests" / "fixtures").glob("*code*/dataset.json"))
        if not candidates:
            print("no code-contests fixture found under tests/fixtures/")
            return 1
        fixture = candidates[0]

    rows = json.loads(fixture.read_text())
    if isinstance(rows, dict):
        key = next(iter(rows))
        rows = rows[key] if isinstance(rows[key], list) else [rows]
    fmt = get_formatter("deepmind_code_contests")
    cols = list(rows[0].keys())
    print(f"fixture: {fixture}  columns: {cols}\n")

    for i, row in enumerate(rows[:n]):
        # the converter takes exactly one column: the description field
        messages = fmt(["description"], row)
        print(f"--- row {i} ---")
        for m in messages:
            content = m["content"]
            preview = content[:120] + ("…" if len(content) > 120 else "")
            print(f"  [{m['role']}] ({len(content)} chars) {preview!r}")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
