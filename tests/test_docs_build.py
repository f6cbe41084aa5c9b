"""Docs integrity without a sphinx install.

The docs CI job runs ``sphinx-build -W`` (``.github/workflows/test.yml``),
but a broken autodoc target should fail FAST in the main suite too: this
test resolves every ``autofunction`` / ``autoclass`` / ``automodule``
directive in ``docs/*.rst`` against the live package, and checks the
toctree's entries exist.
"""

import importlib
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, "docs")


def _rst_files():
    return [os.path.join(DOCS, f) for f in os.listdir(DOCS)
            if f.endswith(".rst")]


def test_autodoc_targets_resolve():
    pat = re.compile(
        r"^\.\.\s+(autofunction|autoclass|automodule)::\s+(\S+)",
        re.MULTILINE)
    found = []
    for path in _rst_files():
        with open(path) as fh:
            found += pat.findall(fh.read())
    assert found, "no autodoc directives found — docs skeleton missing?"
    for kind, target in found:
        if kind == "automodule":
            importlib.import_module(target)
            continue
        module, _, name = target.rpartition(".")
        mod = importlib.import_module(module)
        assert hasattr(mod, name), f"{kind} target {target} does not exist"


def test_toctree_documents_exist():
    with open(os.path.join(DOCS, "index.rst")) as fh:
        text = fh.read()
    in_toc = False
    docs = []
    for line in text.splitlines():
        if line.strip().startswith(".. toctree::"):
            in_toc = True
            continue
        if in_toc:
            s = line.strip()
            if s.startswith(":"):
                continue
            if not s:
                if docs:
                    break
                continue
            docs.append(s)
    for doc in docs:
        base = os.path.join(DOCS, doc)
        assert any(os.path.exists(base + ext) for ext in (".rst", ".md")), (
            f"toctree entry {doc!r} has no source file")
