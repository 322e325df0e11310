"""Version sync across pyproject, the package, and the changelog.

Reference parity: tests/test_version_sync.py keeps pyproject.toml and
``__version__`` from drifting; we additionally pin the CHANGELOG's topmost
section so release notes can't lag the package.
"""

import re
from pathlib import Path

import oscillink_tpu

ROOT = Path(__file__).resolve().parents[1]


def _pyproject_version() -> str:
    text = (ROOT / "pyproject.toml").read_text()
    m = re.search(r'^version = "([^"]+)"', text, re.MULTILINE)
    assert m, "pyproject.toml has no version"
    return m.group(1)


def _changelog_top_version() -> str:
    text = (ROOT / "CHANGELOG.md").read_text()
    m = re.search(r"^## (\d+\.\d+\.\d+)", text, re.MULTILINE)
    assert m, "CHANGELOG.md has no '## x.y.z' section"
    return m.group(1)


def test_package_matches_pyproject():
    assert oscillink_tpu.__version__ == _pyproject_version()


def test_changelog_top_section_matches_package():
    assert _changelog_top_version() == oscillink_tpu.__version__
