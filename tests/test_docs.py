"""Executable documentation: every ```python block in README.md and
docs/examples/*.md runs (at reduced particle counts) against the current
API. Keeps the examples from rotting as the code evolves."""

import pathlib
import re

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

DOCS = [
    REPO / "README.md",
    *sorted((REPO / "docs" / "examples").glob("*.md")),
]

# Scale factors so CPU CI stays fast; purely numeric literals in the docs.
REDUCTIONS = {
    "num_particles=100_000": "num_particles=2000",
    "num_particles=10_000": "num_particles=500",
    "num_particles=8_000_000": "num_particles=2000",
    "100_000": "2000",
    "4096": "8",
    "10_000": "500",
    "1000": "16",
}


def _blocks(path):
    text = path.read_text()
    return re.findall(r"```python\n(.*?)```", text, re.S)


@pytest.mark.parametrize("doc", DOCS, ids=lambda p: p.name)
def test_doc_code_blocks_execute(doc, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # docs that write files write into tmp
    namespace = {}
    for index, block in enumerate(_blocks(doc)):
        if "..." in block:  # illustrative fragment, not runnable
            continue
        if "your own files" in block:  # demonstrates user-supplied files
            continue
        for old, new in REDUCTIONS.items():
            block = block.replace(old, new)
        try:
            exec(block, namespace)  # noqa: S102 - executing our own docs
        except Exception as error:  # pragma: no cover - diagnostic
            pytest.fail(f"{doc.name} block {index} failed: {error!r}")


def test_api_reference_in_sync():
    """docs/api.md matches the live public surface — regenerate with
    ``python scripts/gen_api_docs.py`` when the API changes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", REPO / "scripts" / "gen_api_docs.py"
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    committed = (REPO / "docs" / "api.md").read_text()
    assert gen.generate() == committed, (
        "docs/api.md is stale — run: python scripts/gen_api_docs.py"
    )
