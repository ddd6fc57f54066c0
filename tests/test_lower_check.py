"""The hw_emu-tier lowering check stays usable offline.

Full coverage is `make lower-check` (11 entries, ~4 min); this test pins
the machinery on the cheapest entry so a regression in the cross-platform
export path or the FORCE_COMPILE switch is caught by the suite, not by the
next tunnel outage.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lower_check_single_entry():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lower_check.py"),
         "--only", "v1:bf16:1"],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "1/1 entries lower cleanly" in out.stdout
    # the whole point: real Mosaic kernels, not the interpret fallback
    import re

    m = re.search(r"(\d+) Mosaic kernels lowered", out.stdout)
    assert m and int(m.group(1)) > 0, out.stdout
