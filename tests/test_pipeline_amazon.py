"""Amazon-dataset preprocessing pipeline + data layer, end to end."""

import gzip
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def amazon_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("amzn"))
    rng = np.random.default_rng(0)
    base = f"{root}/amazon"
    os.makedirs(f"{base}/raw", exist_ok=True)
    os.makedirs(f"{base}/raw_others", exist_ok=True)
    os.makedirs(f"{base}/test", exist_ok=True)
    words = ["sturdy", "battery", "cheap", "broke", "love", "size", "color",
             "fits", "great", "bad", "fast", "ship"]

    # raw gzip of python-literal lines (the reference's Amazon dump format)
    with gzip.open(f"{base}/raw/Electronics.json.gz", "wb") as g:
        for p in range(15):
            for r in range(int(rng.integers(12, 25))):
                text = " ".join(rng.choice(words, int(rng.integers(31, 45)))) + "."
                rec = dict(asin=f"prod{p}", reviewText=text,
                           overall=float(rng.integers(1, 6)))
                g.write((repr(rec) + "\n").encode())

    # product meta (python-literal lines)
    with open(f"{base}/raw_others/meta_Electronics.json", "w") as f:
        for p in range(15):
            rec = dict(asin=f"prod{p}", title=f"Gadget {p}", brand="Acme",
                       price=float(rng.integers(5, 200)),
                       categories=[["Electronics", "Audio"], ["Gadgets"]],
                       description="<p>A <b>great</b> gadget.</p>")
            f.write(repr(rec) + "\n")

    # gold eval CSVs
    rows = []
    for p in range(3):
        row = {"prod_id": f"prod{p}"}
        for r in range(1, 9):
            row[f"rev{r}"] = "some review text here."
        for sidx in range(1, 4):
            row[f"summ{sidx}"] = f"summary {sidx}."
        rows.append(row)
    df = pd.DataFrame(rows)
    for name in ("all", "dev", "test"):
        df.to_csv(f"{base}/test/{name}.csv", sep="\t", index=False)

    from multimodalsum_tpu.pipeline.multimodal_prep import run_multimodal_pipeline
    from multimodalsum_tpu.pipeline.textprep import run_text_pipeline

    run_text_pipeline("amazon", [f"{base}/raw/Electronics.json.gz"], root,
                      min_revs=5, min_rev_len=5, max_rev_len=70, percentile=95)
    # 1.prep dir carries the category title for the 5.text back-join
    assert os.path.isdir(f"{base}/1.prep/Electronics")
    run_multimodal_pipeline(root, "amazon", log=lambda *a: None)
    return root


def test_amazon_outputs(amazon_root):
    base = f"{amazon_root}/amazon"
    assert os.listdir(f"{base}/5.text/train")
    meta = pd.read_csv(f"{base}/meta.csv", sep="\t", na_filter=False, dtype=str)
    assert list(meta.columns) == ["group_id", "price", "ratings", "brand",
                                  "name", "category", "description"]
    assert len(meta) > 0
    assert all(len(p) == 11 and set(p) <= {"0", "1"} for p in meta["price"])
    assert all(r == "" or len(r) == 4 for r in meta["ratings"])
    # HTML cleaned out of descriptions
    assert not any("<" in d for d in meta["description"])
    assert all("||" in c or "|" in c or c == "" for c in meta["category"])


def test_amazon_store_and_eval_dataset(amazon_root):
    from multimodalsum_tpu.data.multimodal_data import EvalDataset, MultimodalStore
    from multimodalsum_tpu.data.tokenizer import train_bpe

    tok = train_bpe(["sturdy battery cheap love size great summary review text here"] * 50,
                    300, os.path.join(amazon_root, "_tok"))
    store = MultimodalStore(amazon_root, "amazon", "train", reviews_per_group=3)
    assert len(store) > 0
    ex = store.example(0, tok, max_length=20)
    assert ex["field_values"]["price"].shape == (11,)
    assert ex["field_values"]["description"].shape == (128,)
    assert ex["img"].shape == (1, 224, 224, 3)  # amazon max_imgs = 1

    ds = EvalDataset(amazon_root, "amazon", "test")
    assert len(ds) == 3
    ex = ds.example(0, tok)
    assert ex["reviews"].shape == (8, 118)  # 120-token cap minus bos/eos
    assert len(ds.summaries[0]) == 3


def test_harness_data_parallel_eval(amazon_root):
    """generate_summaries with a data mesh is text-identical to single-device
    (and rejects a batch that doesn't divide over the mesh)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from multimodalsum_tpu.core.config import TINY_CONFIG, GenerationConfig
    from multimodalsum_tpu.data.multimodal_data import EvalDataset
    from multimodalsum_tpu.data.tokenizer import train_bpe
    from multimodalsum_tpu.eval.harness import generate_summaries
    from multimodalsum_tpu.models.multimodal import MultimodalSum, amazon_dummy_table
    from multimodalsum_tpu.parallel.mesh import make_mesh

    tok = train_bpe(["sturdy battery cheap love size great summary review text here"] * 50,
                    300, os.path.join(amazon_root, "_tok_dp"))
    cfg = dataclasses.replace(TINY_CONFIG, vocab_size=320,
                              max_position_embeddings=160)
    model = MultimodalSum(cfg, dataset="amazon", img_model="tiny")
    fd, vd = amazon_dummy_table(1)
    variables = model.init(jax.random.PRNGKey(0), fd, vd,
                           method=MultimodalSum.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]
    gen = GenerationConfig(num_beams=2, max_length=8, min_length=2,
                           length_penalty=1.0, early_stopping=True)
    ds = EvalDataset(amazon_root, "amazon", "test")

    ref = generate_summaries(model, params, batch_stats, ds, tok, gen,
                             batch_size=8, log=lambda *a: None)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    dp = generate_summaries(model, params, batch_stats, ds, tok, gen,
                            batch_size=8, log=lambda *a: None, mesh=mesh)
    assert dp == ref and len(dp) == len(ds)

    with _pytest.raises(ValueError, match="divisible"):
        generate_summaries(model, params, batch_stats, ds, tok, gen,
                           batch_size=3, log=lambda *a: None, mesh=mesh)

    # greedy eval (num_beams == 1): GreedyResult has 1-D lengths — the
    # harness must handle both result shapes (regression: trace-time
    # IndexError on res.lengths[:, 0])
    gen1 = gen.replace(num_beams=1, early_stopping=False)
    greedy = generate_summaries(model, params, batch_stats, ds, tok, gen1,
                                batch_size=8, log=lambda *a: None)
    assert len(greedy) == len(ds) and all(isinstance(s, str) for s in greedy)


def test_harness_continuous_scheduler_token_identical(amazon_root):
    """scheduler='continuous' (slot engine bulk eval, VERDICT r2 #2) must
    reproduce the static while_loop path's texts exactly — beam AND greedy,
    including a batch_size that doesn't divide the row count, n_slots
    smaller than the batch (queue+refill), and steps_per_tick > 1."""
    import dataclasses

    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG, GenerationConfig
    from multimodalsum_tpu.data.multimodal_data import EvalDataset
    from multimodalsum_tpu.data.tokenizer import train_bpe
    from multimodalsum_tpu.eval.harness import generate_summaries
    from multimodalsum_tpu.models.multimodal import MultimodalSum, amazon_dummy_table

    tok = train_bpe(["sturdy battery cheap love size great summary review text here"] * 50,
                    300, os.path.join(amazon_root, "_tok_cont"))
    cfg = dataclasses.replace(TINY_CONFIG, vocab_size=320,
                              max_position_embeddings=160)
    model = MultimodalSum(cfg, dataset="amazon", img_model="tiny")
    fd, vd = amazon_dummy_table(1)
    variables = model.init(jax.random.PRNGKey(0), fd, vd,
                           method=MultimodalSum.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]
    ds = EvalDataset(amazon_root, "amazon", "test")

    gen = GenerationConfig(num_beams=2, max_length=10, min_length=2,
                           length_penalty=1.0, early_stopping=True)
    t_static = []
    ref = generate_summaries(model, params, batch_stats, ds, tok, gen,
                             batch_size=2, log=lambda *a: None,
                             steady_timing=t_static)
    # steady_timing: one (rows, secs) tuple, rows = everything after the
    # compile-carrying first batch, secs > 0
    assert len(t_static) == 1 and t_static[0][1] > 0
    assert t_static[0][0] == len(ds) - 2
    t_cont = []
    cont = generate_summaries(model, params, batch_stats, ds, tok, gen,
                              batch_size=2, log=lambda *a: None,
                              scheduler="continuous", n_slots=2,
                              steps_per_tick=3, steady_timing=t_cont)
    assert cont == ref and len(cont) == len(ds)
    assert len(t_cont) == 1 and t_cont[0][1] > 0 and 0 <= t_cont[0][0] <= len(ds)

    # fewer slots than the submit wave: rows queue and refill freed slots
    cont_small = generate_summaries(model, params, batch_stats, ds, tok, gen,
                                    batch_size=3, log=lambda *a: None,
                                    scheduler="continuous", n_slots=1)
    assert cont_small == ref

    # greedy path through the slot engine
    gen1 = gen.replace(num_beams=1)
    ref1 = generate_summaries(model, params, batch_stats, ds, tok, gen1,
                              batch_size=2, log=lambda *a: None)
    cont1 = generate_summaries(model, params, batch_stats, ds, tok, gen1,
                               batch_size=2, log=lambda *a: None,
                               scheduler="continuous")
    assert cont1 == ref1

    # a mesh + continuous is an explicit error
    from multimodalsum_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="single-device"):
        generate_summaries(model, params, batch_stats, ds, tok, gen,
                           batch_size=8, log=lambda *a: None,
                           scheduler="continuous",
                           mesh=make_mesh(data=len(jax.devices()), model=1))


def test_harness_spec_window_token_identical(amazon_root):
    """spec_window>1 bulk greedy eval (prompt-lookup drafts from each row's
    own reviews, verified-exact) must reproduce classic greedy texts."""
    import dataclasses

    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG, GenerationConfig
    from multimodalsum_tpu.data.multimodal_data import EvalDataset
    from multimodalsum_tpu.data.tokenizer import train_bpe
    from multimodalsum_tpu.eval.harness import generate_summaries
    from multimodalsum_tpu.models.multimodal import MultimodalSum, amazon_dummy_table

    tok = train_bpe(["sturdy battery cheap love size great summary review text here"] * 50,
                    300, os.path.join(amazon_root, "_tok_spec"))
    cfg = dataclasses.replace(TINY_CONFIG, vocab_size=320,
                              max_position_embeddings=160)
    model = MultimodalSum(cfg, dataset="amazon", img_model="tiny")
    fd, vd = amazon_dummy_table(1)
    variables = model.init(jax.random.PRNGKey(0), fd, vd,
                           method=MultimodalSum.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]
    ds = EvalDataset(amazon_root, "amazon", "test")
    gen = GenerationConfig(num_beams=1, max_length=12, min_length=2,
                           length_penalty=1.0, early_stopping=False)

    ref = generate_summaries(model, params, batch_stats, ds, tok, gen,
                             batch_size=2, log=lambda *a: None)
    spec = generate_summaries(model, params, batch_stats, ds, tok, gen,
                              batch_size=2, log=lambda *a: None,
                              scheduler="continuous", spec_window=3)
    assert spec == ref

    with pytest.raises(ValueError, match="continuous"):
        generate_summaries(model, params, batch_stats, ds, tok, gen,
                           batch_size=2, log=lambda *a: None, spec_window=3)


def test_harness_staged_equals_streamed(amazon_root):
    """generate_summaries(staged_batches=...) — the gate's device-pinned
    reuse path — must produce exactly the streamed path's summaries, for
    both schedulers."""
    import dataclasses

    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG, GenerationConfig
    from multimodalsum_tpu.data.multimodal_data import EvalDataset
    from multimodalsum_tpu.data.tokenizer import train_bpe
    from multimodalsum_tpu.eval.harness import (
        generate_summaries, stage_eval_batches,
    )
    from multimodalsum_tpu.models.multimodal import MultimodalSum, amazon_dummy_table

    tok = train_bpe(["sturdy battery cheap love size great summary review text here"] * 50,
                    300, os.path.join(amazon_root, "_tok_staged"))
    cfg = dataclasses.replace(TINY_CONFIG, vocab_size=320,
                              max_position_embeddings=160)
    model = MultimodalSum(cfg, dataset="amazon", img_model="tiny")
    fd, vd = amazon_dummy_table(1)
    variables = model.init(jax.random.PRNGKey(0), fd, vd,
                           method=MultimodalSum.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]
    gen = GenerationConfig(num_beams=2, max_length=8, min_length=2,
                           length_penalty=1.0, early_stopping=True)
    ds = EvalDataset(amazon_root, "amazon", "test")

    streamed = generate_summaries(model, params, batch_stats, ds, tok, gen,
                                  batch_size=2, log=lambda *a: None)
    staged = stage_eval_batches(ds, tok, 2)
    got = generate_summaries(model, params, batch_stats, ds, tok, gen,
                             batch_size=2, log=lambda *a: None,
                             staged_batches=staged)
    assert got == streamed and len(got) == len(ds)

    cont = generate_summaries(model, params, batch_stats, ds, tok, gen,
                              batch_size=2, log=lambda *a: None,
                              scheduler="continuous", n_slots=2,
                              staged_batches=staged)
    assert cont == streamed
