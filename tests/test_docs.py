"""Documentation code blocks run as tests.

The reference executes its docs (``lightmotif-py/.../test_doctest.py``,
doctests throughout the Rust sources); here every ```python fence in
README.md and docs/API.md execs in a shared per-file namespace, so a
broken example fails the suite (VERDICT round-2 task 9).
"""

import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", os.path.join("docs", "API.md")]

_FENCE = re.compile(r"```python\n(.*?)```", re.S)


def _blocks(path):
    with open(os.path.join(ROOT, path)) as fh:
        return _FENCE.findall(fh.read())


@pytest.mark.parametrize("path", DOCS)
def test_doc_python_blocks_execute(path):
    blocks = _blocks(path)
    assert blocks, f"{path} has no ```python blocks"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{path}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"{path} block {i} failed: {e!r}\n{block}")
