"""Packaging hygiene guards: single-sourced version, license metadata.

Round-2 review found ``__init__.py`` and ``pyproject.toml`` disagreeing on the
version (0.1.0 vs 0.2.0) and no license at all — these tests keep both under
the same drift-guard culture as the perf artifacts.
"""

import pathlib
import tomllib

import cheetah_tpu

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]


def _project_table() -> dict:
    with open(REPO_ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def test_version_single_source():
    assert cheetah_tpu.__version__ == _project_table()["version"]


def test_license_present():
    license_path = REPO_ROOT / "LICENSE"
    assert license_path.is_file()
    text = license_path.read_text()
    assert "MIT License" in text
    assert _project_table()["license"] == {"text": "MIT"}
