"""The static doc-site builder (docs/build.py) must stay runnable:
pages render, cross-links rewrite, tutorials convert to notebooks."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    pytest.importorskip("markdown")
    pytest.importorskip("nbformat")
    out = tmp_path_factory.mktemp("site")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "docs", "build.py"),
         "--out", str(out)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    return out


def test_pages_render(site):
    for page in ("index.html", "getting_started.html", "api.html",
                 "architecture.html"):
        text = (site / page).read_text()
        assert "<main>" in text and len(text) > 1000, page
        assert ".md)" not in text  # cross-links rewritten to .html


def test_tutorial_notebooks(site):
    import nbformat

    names = [f for f in os.listdir(site / "tutorials")
             if f.endswith(".ipynb")]
    assert len(names) >= 5
    for name in names:
        nb = nbformat.read(site / "tutorials" / name, as_version=4)
        assert nb.cells[0].cell_type == "markdown"
        assert any(c.cell_type == "code" for c in nb.cells)


def test_tutorials_index(site):
    text = (site / "tutorials" / "index.html").read_text()
    assert "vacf_example.ipynb" in text
