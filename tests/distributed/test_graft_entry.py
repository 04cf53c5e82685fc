"""The driver's dry-run contract, kept green in the suite: all three
sharding modes compile and execute on the virtual device mesh."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


@pytest.mark.parametrize("n", [8, 4, 3, 1])
def test_dryrun_multichip(n):
    import __graft_entry__ as ge
    ge.dryrun_multichip(n)


def test_entry_runs():
    import numpy as np
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = np.asarray(fn(*args))
    assert out.shape == (288, 384)
    assert (out >= -1).all()
