"""Control-flow contract of bench.quality_gate's section selector.

The gate's measurements need the chip + the in-environment trained
checkpoint, but its CONTROL FLOW (which sections run, what keys each one
emits, the valmin learning-evidence block) is pure Python — locked here
with fakes so a refactor can't silently drop a section or rename a key the
driver's BENCH_r{N}.json consumers read.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")


def _fake_env(tmp_path, with_valmin: bool):
    """Minimal on-disk layout + monkeypatchable fakes for quality_gate."""
    root = tmp_path / "work"
    for sub in ("ckpt",) + (("ckpt_valmin",) if with_valmin else ()):
        d = root / sub / "multimodal_trained_yelp"
        d.mkdir(parents=True)
        (d / "meta.json").write_text(json.dumps(
            {"epoch": 54 if sub == "ckpt_valmin" else 69,
             "step": 550 if sub == "ckpt_valmin" else 700,
             "val_loss": 5.37 if sub == "ckpt_valmin" else 6.15}))
    return str(root)


class _FakeTok:
    def encode(self, text):
        return text.split()


class _FakeDataset:
    """Three rows; summaries/reviews in the EvalDataset attribute shape."""

    summaries = [["gold summary one"], ["gold summary two"], ["gold three"]]
    reviews = [["lead review a", "r2"], ["lead review b", "r2"],
               ["lead review c", "r2"]]

    def __init__(self, *a, **k):
        pass

    def __len__(self):
        return 3


def _patched_gate(monkeypatch, root, sections, preds_by_tag):
    import jax

    import bench
    import multimodalsum_tpu.ckpt.checkpoint as ckpt_mod
    import multimodalsum_tpu.cli.common as cli_common
    import multimodalsum_tpu.data.multimodal_data as mmdata
    import multimodalsum_tpu.eval.harness as harness

    monkeypatch.setattr(bench, "shared_model_state",
                        lambda dataset="yelp": {"model": object(),
                                                "params": {},
                                                "batch_stats": {}})
    # the gate stages eval weights on device once per pass (bench.py
    # device_put, the r4 1.6 GB-per-batch reshipping fix); the fake param
    # trees carry path strings, which are not JAX types — stub the staging
    # (tests lock the gate's CONTROL FLOW; on-chip behavior is GATE_r{N})
    monkeypatch.setattr(jax, "device_put", lambda x, *a, **k: x)
    monkeypatch.setattr(ckpt_mod, "load_eval_params",
                        lambda d, p, bs: ({"ck": d}, {}))
    monkeypatch.setattr(cli_common, "load_tokenizer", lambda a: _FakeTok())
    monkeypatch.setattr(mmdata, "EvalDataset", _FakeDataset)

    calls = []

    def fake_generate(model, params, batch_stats, dataset, tokenizer, gen,
                      **kw):
        on_valmin = isinstance(params, dict) and params.get(
            "ck", "").endswith("ckpt_valmin/multimodal_trained_yelp")
        tag = (f"kvq={kw.get('kv_quant')}" if kw.get("kv_quant")
               else f"sched={kw.get('scheduler')}"
               if kw.get("scheduler") else
               "valmin" if on_valmin else "exact")
        if kw.get("kv_quant") and on_valmin:
            tag += "@valmin"  # r5: quant tiers decode the val-min ckpt
        if kw.get("spec_window"):
            tag += f"+spec{kw['spec_window']}"
        calls.append(tag)
        st = kw.get("steady_timing")
        if st is not None:
            st.append((len(dataset), 2.0))
        if kw.get("stats_out") is not None and kw.get("spec_window", 1) > 1:
            kw["stats_out"]["spec"] = {"tokens_per_window": 2.5,
                                       "draft_acceptance": 0.5}
        return preds_by_tag.get(tag, ["pred one", "pred two", "pred thr"])

    monkeypatch.setattr(harness, "generate_summaries", fake_generate)
    # device staging needs a real dataset/tokenizer/chip; the fakes carry none
    monkeypatch.setattr(harness, "stage_eval_batches", lambda *a, **k: [])
    out = bench.quality_gate(root, timing_batch=3, sections=sections)
    return out, calls


def test_gate_valmin_section(tmp_path, monkeypatch):
    root = _fake_env(tmp_path, with_valmin=True)
    out, calls = _patched_gate(
        monkeypatch, root, sections=("valmin",),
        preds_by_tag={"valmin": ["gold summary one", "x", "y"]})
    # exact always runs; ONLY valmin beyond it — no quant/sched/spec calls
    assert calls == ["exact", "valmin"]
    assert "int8" not in out and "bulk_continuous_sps" not in out
    assert "greedy_spec" not in out
    vm = out["valmin"]
    assert vm["ckpt_step"] == 550 and vm["val_loss"] == 5.37
    assert set(vm) >= {"exact", "beats_lead_baseline", "vs_overfit"}
    assert vm["vs_overfit"]["rows"] == 3
    # lead-review baseline emitted for the comparison the flag encodes
    assert "lead_review_baseline" in out
    assert isinstance(vm["beats_lead_baseline"], bool)


def test_gate_valmin_absent_is_skipped(tmp_path, monkeypatch):
    root = _fake_env(tmp_path, with_valmin=False)
    out, calls = _patched_gate(monkeypatch, root, sections=("valmin",),
                               preds_by_tag={})
    assert calls == ["exact"]
    assert "valmin" not in out


def test_gate_full_sections_schema(tmp_path, monkeypatch):
    root = _fake_env(tmp_path, with_valmin=False)
    out, calls = _patched_gate(
        monkeypatch, root,
        sections=("quant", "sched", "spec", "randinit"), preds_by_tag={})
    assert calls[0] == "exact"
    assert {"rouge1", "rouge2", "rougeL"} <= set(out["randinit"])
    assert {"kvq=int8", "kvq=int4_r1", "kvq=int4+int8", "kvq=int4",
            "sched=continuous"} <= set(calls)
    # spec runs classic (w=1 -> engine treats as non-spec) + spec_w4
    assert any(c.endswith("+spec4") for c in calls)
    for kvq in ("int8", "int4_r1", "int4+int8", "int4"):
        assert {"agreement", "id_rougeL", "gold", "gold_delta",
                "basis"} <= set(out[kvq])
        # no valmin section ran -> tiers fall back to the overfit basis
        assert out[kvq]["basis"] == "overfit"
    assert out["quant_basis"] == "overfit"
    assert "continuous_vs_static" in out
    assert out["greedy_spec"]["speedup"] is not None
    assert out["greedy_spec"]["acceptance"]["draft_acceptance"] == 0.5
    # headline consumers read these (r5 criterion: quality floor + gold
    # delta on the quant basis primary, id-RL diagnostic)
    assert "beats_lead_baseline" in out["gate_criterion"]
    assert "gold_rougeL" in out["gate_criterion"]
    assert out["criterion_version"] == "r5"
    assert isinstance(out["beats_lead_baseline"], bool)


def test_gate_quant_decodes_valmin_basis(tmp_path, monkeypatch):
    """r5 (VERDICT r4 #3): when the valmin section runs, every quant tier
    decodes the VAL-MIN checkpoint and its gold_delta/id-RL are measured
    against the valmin exact pass, not the overfit one."""
    root = _fake_env(tmp_path, with_valmin=True)
    out, calls = _patched_gate(
        monkeypatch, root, sections=("valmin", "quant"),
        preds_by_tag={"valmin": ["vm pred one", "vm pred two", "vm three"],
                      "kvq=int8@valmin": ["vm pred one", "vm pred two",
                                          "vm three"]})
    assert calls[0] == "exact" and calls[1] == "valmin"
    # every tier call carries the valmin params (fake tags them @valmin)
    kvq_calls = [c for c in calls if c.startswith("kvq=")]
    assert kvq_calls and all(c.endswith("@valmin") for c in kvq_calls)
    assert out["quant_basis"] == "valmin"
    assert out["quant_basis_gold_rougeL"] == out["valmin"]["exact"]["rougeL"]
    # int8's fake output matches the valmin exact pass exactly -> full
    # agreement and zero gold delta ON THE VALMIN BASIS
    assert out["int8"]["basis"] == "valmin"
    assert out["int8"]["agreement"] == 1.0
    assert out["int8"]["gold_delta"] == 0.0
    # a tier that returns the default (non-valmin) preds must NOT score
    # full agreement against the valmin basis
    assert out["int4"]["agreement"] < 1.0
