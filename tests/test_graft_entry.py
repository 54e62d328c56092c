"""Driver contract (__graft_entry__.py): entry() compiles and renders;
dryrun_multichip runs a full dp x sp sharded training step on the fake mesh."""

import sys

import jax
import numpy as np


def _load():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as e

    return e


def test_entry_forward():
    e = _load()
    fn, args = e.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (256, 256, 3)
    assert np.isfinite(out).all()
    assert out.max() > 0.05  # scene actually renders something


def test_dryrun_multichip_8():
    e = _load()
    e.dryrun_multichip(8)


def test_dryrun_multichip_2():
    e = _load()
    e.dryrun_multichip(2)
