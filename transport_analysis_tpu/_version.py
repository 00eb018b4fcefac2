"""Version bookkeeping (lightweight stand-in for the reference's
versioneer machinery — same ``get_versions()`` surface, none of the
2000-line boilerplate)."""

from __future__ import annotations

import os
import subprocess

__version__ = "0.9.0"


def _git_revision() -> str | None:
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=here,
            capture_output=True,
            text=True,
            timeout=5,
        )
        if out.returncode == 0:
            return out.stdout.strip()
    except Exception:
        pass
    return None


def get_versions() -> dict:
    return {
        "version": __version__,
        "full-revisionid": _git_revision(),
        "dirty": None,
        "error": None,
    }
