"""Build a static HTML documentation site from the markdown docs.

The reference ships a sphinx site (reference docs/source/conf.py);
sphinx is not installable in this environment, so this builds an
equivalent browsable site with the stdlib-adjacent ``markdown`` +
``pygments`` packages (both in the base image), and converts the
runnable ``docs/tutorials/*.py`` scripts into Jupyter notebooks
(nbformat) mirroring the reference's ``docs/tutorials/*.ipynb``.

Usage:
    python docs/build.py [--out docs/_site] [--execute]

``--execute`` runs each tutorial notebook through nbclient so the
committed notebooks carry real output cells (CPU, a few minutes).
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

HERE = os.path.dirname(os.path.abspath(__file__))

PAGES = [
    ("index.md", "Overview"),
    ("getting_started.md", "Getting started"),
    ("api.md", "API reference"),
    ("architecture.md", "Architecture"),
]

_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>{title} — transport_analysis_tpu</title>
<style>
body {{ font-family: -apple-system, "Segoe UI", sans-serif;
       margin: 0; color: #1a1a1a; }}
nav {{ position: fixed; top: 0; left: 0; bottom: 0; width: 220px;
      background: #f4f4f6; padding: 1.2rem; overflow-y: auto;
      border-right: 1px solid #ddd; }}
nav a {{ display: block; padding: .3rem 0; color: #205080;
        text-decoration: none; }}
nav a.current {{ font-weight: 700; }}
main {{ margin-left: 250px; max-width: 54rem; padding: 2rem; }}
pre {{ background: #f6f8fa; padding: .8rem; overflow-x: auto;
      border-radius: 6px; font-size: .9em; }}
code {{ background: #f6f8fa; padding: .1em .3em; border-radius: 3px; }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #ccc; padding: .35rem .6rem; }}
h1, h2, h3 {{ scroll-margin-top: 1rem; }}
{pygments_css}
</style>
</head>
<body>
<nav>
<strong>transport_analysis_tpu</strong>
{nav}
</nav>
<main>
{body}
</main>
</body>
</html>
"""


def _md():
    import markdown

    return markdown.Markdown(
        extensions=["fenced_code", "codehilite", "tables", "toc"],
        extension_configs={
            "codehilite": {"guess_lang": False},
        },
    )


def build_pages(out: str):
    from pygments.formatters import HtmlFormatter

    css = HtmlFormatter().get_style_defs(".codehilite")
    os.makedirs(out, exist_ok=True)
    nav_entries = [
        (src.replace(".md", ".html"), title) for src, title in PAGES
    ]
    nav_entries.append(("tutorials/index.html", "Tutorials"))
    md = _md()
    for src, title in PAGES:
        with open(os.path.join(HERE, src)) as fh:
            text = fh.read()
        # rewrite cross-links between the markdown pages
        text = re.sub(r"\(([\w_]+)\.md\)", r"(\1.html)", text)
        md.reset()
        body = md.convert(text)
        nav = "\n".join(
            f'<a href="{"../" if False else ""}{href}"'
            f'{" class=current" if href == src.replace(".md", ".html") else ""}>'
            f"{t}</a>"
            for href, t in nav_entries
        )
        html = _TEMPLATE.format(
            title=title, nav=nav, body=body, pygments_css=css
        )
        with open(
            os.path.join(out, src.replace(".md", ".html")), "w"
        ) as fh:
            fh.write(html)


def py_to_notebook(path: str):
    """Convert a tutorial script to a notebook: module docstring and
    ``# %%``/comment-block headers become markdown cells, code runs
    between them (the jupytext "percent" convention, hand-rolled)."""
    import nbformat as nbf

    with open(path) as fh:
        src = fh.read()
    nb = nbf.v4.new_notebook()
    cells = []
    m = re.match(r'^"""(.*?)"""\s*', src, re.S)
    if m:
        cells.append(nbf.v4.new_markdown_cell(m.group(1).strip()))
        src = src[m.end():]
    # one code cell per double-blank-line separated block
    blocks = re.split(r"\n\n\n", src)
    for block in blocks:
        block = block.strip("\n")
        if not block:
            continue
        cells.append(nbf.v4.new_code_cell(block))
    nb["cells"] = cells
    nb["metadata"]["kernelspec"] = {
        "display_name": "Python 3", "language": "python",
        "name": "python3",
    }
    return nb


def build_tutorials(out: str, execute: bool):
    import nbformat as nbf

    tut_out = os.path.join(out, "tutorials")
    os.makedirs(tut_out, exist_ok=True)
    scripts = sorted(
        f for f in os.listdir(os.path.join(HERE, "tutorials"))
        if f.endswith(".py")
    )
    links = []
    for script in scripts:
        nb = py_to_notebook(os.path.join(HERE, "tutorials", script))
        if execute:
            import nbformat as _nbf
            from nbclient import NotebookClient

            # kernel needs the repo root importable + the CPU backend
            repo = os.path.dirname(HERE)
            nb.cells.insert(0, _nbf.v4.new_code_cell(
                "import sys; sys.path.insert(0, %r)\n"
                "import jax; jax.config.update('jax_platforms', 'cpu')"
                % repo
            ))
            NotebookClient(
                nb, timeout=600,
                resources={"metadata": {"path": repo}},
            ).execute()
            nb.cells.pop(0)
        name = script.replace(".py", ".ipynb")
        if execute:
            # reference parity: the reference commits its executed
            # tutorial notebooks (reference docs/tutorials/*.ipynb
            # carry output cells) — write the executed notebook to
            # the COMMITTED location too, not just the site dir
            nbf.write(nb, os.path.join(HERE, "tutorials", name))
        nbf.write(nb, os.path.join(tut_out, name))
        links.append(name)
        shutil.copy(
            os.path.join(HERE, "tutorials", script), tut_out
        )
    from pygments.formatters import HtmlFormatter

    css = HtmlFormatter().get_style_defs(".codehilite")
    body = "<h1>Tutorials</h1><ul>" + "".join(
        f'<li><a href="{n}">{n}</a> '
        f'(<a href="{n.replace(".ipynb", ".py")}">script</a>)</li>'
        for n in links
    ) + "</ul>"
    nav = "\n".join(
        f'<a href="../{src.replace(".md", ".html")}">{t}</a>'
        for src, t in PAGES
    ) + '\n<a href="index.html" class="current">Tutorials</a>'
    with open(os.path.join(tut_out, "index.html"), "w") as fh:
        fh.write(_TEMPLATE.format(
            title="Tutorials", nav=nav, body=body, pygments_css=css
        ))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "_site"))
    ap.add_argument("--execute", action="store_true")
    args = ap.parse_args()
    build_pages(args.out)
    build_tutorials(args.out, args.execute)
    print(f"site built at {args.out}")


if __name__ == "__main__":
    main()
