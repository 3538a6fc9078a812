"""Driver-contract regression: dryrun_multichip runs DP and DP x TP on the
virtual 8-device CPU mesh (this is exactly what the round driver executes)."""

import sys

import pytest

from conftest import REPO_ROOT


def test_dryrun_multichip_8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    sys.path.insert(0, REPO_ROOT)
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally (finite loss, dp == dp x tp)
