"""Full four-stage integration: preprocessing -> stage 0/1/2a/2b/3 -> eval,
through the real CLIs with real checkpoint handoffs (the e2e demo as a test)."""

import os
import sys

import pytest


def test_full_pipeline_stages(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import scripts.e2e_demo as demo

    cwd = os.getcwd()
    old_argv = sys.argv
    try:
        sys.argv = ["e2e_demo.py", str(tmp_path)]
        demo.main()
    finally:
        os.chdir(cwd)
        sys.argv = old_argv

    # stage artifacts exist and the eval wrote summaries
    for ck in ("bart-review_yelp", "text_pretrained_yelp", "img_pretrained_yelp",
               "table_pretrained_yelp", "multimodal_trained_yelp"):
        assert os.path.isdir(tmp_path / "ckpt" / ck / "export"), ck
    out = (tmp_path / "generated.txt").read_text().splitlines()
    assert len(out) >= 4
    # continuous-batching serve CLI produced one line per dev group
    served = (tmp_path / "generated_serve.txt").read_text().splitlines()
    assert len(served) >= 4
    assert all("\t" in line for line in served)  # group_id \t summary
