"""Driver entry points stay healthy (the harness compile-checks these)."""

import sys
import os

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles_and_runs():
    import __graft_entry__ as E

    fn, args = E.entry()
    out = jax.jit(fn)(*args)
    coords, forces = out
    assert coords.shape[1] == 3
    assert np.isfinite(np.asarray(coords)).all()


def test_dryrun_multichip():
    import __graft_entry__ as E

    E.dryrun_multichip(4)
    E.dryrun_multichip(8)
