"""Sanity for bench.py's analytic helpers (kept honest: the MFU numbers the
driver records derive from these)."""

import importlib
import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("bench")


def test_train_step_flops_scales_linearly_in_batch():
    bench = _bench()
    from multimodalsum_tpu.core.config import BartConfig

    cfg = BartConfig()
    f8 = bench.train_step_flops(cfg, 8)
    f16 = bench.train_step_flops(cfg, 16)
    assert 1.95 < f16 / f8 < 2.05  # all terms are linear in b
    # magnitude sanity: bart-large x9 rotations at b8 is O(100) TFLOP
    assert 1e13 < f8 < 1e15


def test_decode_step_flops_monotonic_in_position():
    bench = _bench()
    from multimodalsum_tpu.core.config import BartConfig

    cfg = BartConfig()
    f1 = bench.decode_step_flops(cfg, 48, 5, 1)
    f141 = bench.decode_step_flops(cfg, 48, 5, 141)
    assert f141 > f1  # self-attention grows with cache position
    # dominated by the static cross-attention + head terms, so the growth
    # is modest
    assert f141 / f1 < 2.0


def test_chip_peak_lookup_has_default():
    bench = _bench()
    assert bench.chip_peak_flops() > 1e14  # any TPU generation


def test_prefix_match_fraction():
    from bench import prefix_match_fraction

    assert prefix_match_fraction([1, 2, 3], [1, 2, 3]) == 1.0
    assert prefix_match_fraction([1, 2, 3, 4], [1, 2, 9, 4]) == 0.5
    assert prefix_match_fraction([1, 2], [3, 2]) == 0.0
    # divergence by truncation: shorter other sequence caps the match
    assert prefix_match_fraction([1, 2, 3, 4], [1, 2]) == 0.5
    assert prefix_match_fraction([], [1]) == 0.0


def test_resolve_quality_floor_prefers_valmin():
    """The quant-promotion floor keys on the learning-evidence checkpoint
    (ckpt_valmin) when its section ran; the overfit exact verdict is only a
    fallback (r4: valmin beats the lead baseline at goldRL 16.03 while the
    overfit stress-test basis scores 13.05 — tiers must not be demoted for
    the basis's deliberate overfit)."""
    import bench

    gate = {"beats_lead_baseline": False,
            "valmin": {"beats_lead_baseline": True}}
    assert bench.resolve_quality_floor(gate) == (True, "valmin")
    # valmin section ran and FAILED the floor -> floor fails even if the
    # (memorising) overfit ckpt somehow passed
    gate = {"beats_lead_baseline": True,
            "valmin": {"beats_lead_baseline": False}}
    assert bench.resolve_quality_floor(gate) == (False, "valmin")
    # no valmin section -> exact verdict decides
    assert bench.resolve_quality_floor(
        {"beats_lead_baseline": True}) == (True, "exact")
    assert bench.resolve_quality_floor({}) == (False, "exact")
