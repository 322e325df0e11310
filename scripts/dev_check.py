"""Developer check wrapper (reference scripts/dev_check.py): lint + types +
tests, skipping tools that aren't installed in this image."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import subprocess
import sys


def main() -> int:
    rc = 0
    for tool, cmd in (
        ("ruff", ["ruff", "check", "oscillink_tpu", "tests", "scripts"]),
        ("mypy", ["mypy", "--ignore-missing-imports", "oscillink_tpu"]),
    ):
        if shutil.which(tool):
            print(f"== {tool} ==")
            rc |= subprocess.call(cmd)
        else:
            print(f"== {tool} not installed, skipping ==")
    print("== pytest ==")
    rc |= subprocess.call([sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    return rc


if __name__ == "__main__":
    sys.exit(main())
