"""CLAUDE.md's pinned test counts must match actual collection.

VERDICT r4 weak #4: the counts drifted three rounds running; this makes the
pin structural — the suite fails until the doc is updated (or vice versa).
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_claude_md_test_counts_match_collection():
    text = open(os.path.join(REPO, "CLAUDE.md")).read()
    m = re.search(r"test counts: (\d+) default / (\d+) total", text)
    assert m, (
        "CLAUDE.md lost its parseable 'test counts: N default / M total' "
        "line (this guard keys on it)"
    )
    pinned_default, pinned_total = int(m.group(1)), int(m.group(2))

    # no -q: quiet mode suppresses the "N/M tests collected" tally line
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    tail = "\n".join(p.stdout.strip().splitlines()[-3:])
    mm = re.search(r"(\d+)/(\d+) tests collected", tail)
    if mm:  # default tier deselects slow -> "sel/total tests collected"
        default, total = int(mm.group(1)), int(mm.group(2))
    else:
        mm = re.search(r"(\d+) tests collected", tail)
        assert mm, f"cannot parse collect-only output tail:\n{tail}"
        default = total = int(mm.group(1))
    assert (pinned_default, pinned_total) == (default, total), (
        f"CLAUDE.md pins {pinned_default} default / {pinned_total} total "
        f"but collection finds {default}/{total} — update CLAUDE.md's "
        "'test counts' line"
    )
