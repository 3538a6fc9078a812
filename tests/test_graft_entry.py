"""Driver-contract regression: dryrun_multichip runs DP and DP x TP on the
virtual 8-device CPU mesh (this is exactly what the round driver executes)."""

import pytest


def test_dryrun_multichip_8():
    import jax

    try:
        devices = jax.devices("cpu")
    except RuntimeError:
        devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally (finite loss, dp == dp x tp)
