"""Driver entry-point contract (round-1 VERDICT missing #2).

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(8)`` with only ONE real device visible — the entry
must force its own virtual CPU mesh. Under this suite the 8-device CPU
backend already exists, so the inline path runs; the subprocess
re-exec path is what the driver exercises (validated manually from the
axon env, and cheap enough to smoke-test once here too).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_is_finite():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    for o in jax.block_until_ready(out):
        assert np.all(np.isfinite(np.asarray(o)))


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip_inline(n):
    graft.dryrun_multichip(n)


def test_dryrun_multichip_subprocess_reexec(monkeypatch):
    """Force the subprocess path even though this process has devices:
    simulates the driver env where only one real chip is visible."""
    import jax

    monkeypatch.setattr(
        graft, "_dryrun_body",
        lambda n: (_ for _ in ()).throw(AssertionError("must re-exec")),
    )
    # pretend the current process can't satisfy the request
    monkeypatch.setattr(jax, "devices", lambda: [object()])
    graft.dryrun_multichip(2)
