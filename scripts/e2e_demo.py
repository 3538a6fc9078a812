"""Full four-stage pipeline demo on synthetic data (tiny model, CPU-friendly).

Exercises every stage through the real CLIs with the real checkpoint-handoff
contract (reference README.md:119-141 pipeline):

  raw dumps -> preprocess -> bart_review (stage 0) -> text_pretrain (stage 1)
  -> img_pretrain + table_pretrain (stage 2) -> multimodal_train (stage 3)
  -> test (beam-search eval + ROUGE)

Usage:  python scripts/e2e_demo.py [workdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ.get("MMS_DEMO_PLATFORM", "cpu"))

import numpy as np


def build_synthetic_data(root, rng):
    """Reuse the pipeline test's synthetic Yelp raw dumps."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_pipeline import _make_yelp_raw

    _make_yelp_raw(root, rng)
    from multimodalsum_tpu.pipeline.multimodal_prep import run_multimodal_pipeline
    from multimodalsum_tpu.pipeline.textprep import run_text_pipeline

    run_text_pipeline("yelp", [f"{root}/yelp/raw/reviews.json"], root,
                      min_revs=5, min_rev_len=5, max_rev_len=70, percentile=95)
    run_multimodal_pipeline(root, "yelp")


def main():
    import tempfile

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mms_e2e_")
    work = os.path.abspath(work)  # paths below are used after chdir
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    rng = np.random.default_rng(0)
    print(f"== workdir {work}")

    print("== preprocessing")
    build_synthetic_data(work, rng)

    from multimodalsum_tpu.data.tokenizer import train_bpe
    from multimodalsum_tpu.pipeline.textprep import read_group_csv
    import glob

    corpus = []
    for fp in glob.glob(f"{work}/yelp/5.text/train/*.csv"):
        corpus.extend(r["review_text"] for r in read_group_csv(fp))
    train_bpe(corpus * 3, 400, f"{work}/tok")

    cfgp = f"{work}/tiny.json"
    json.dump(dict(vocab_size=400, d_model=32, encoder_layers=2, decoder_layers=2,
                   encoder_attention_heads=4, decoder_attention_heads=4,
                   encoder_ffn_dim=64, decoder_ffn_dim=64,
                   max_position_embeddings=256, dropout=0.1),
              open(cfgp, "w"))

    common = ["--dataset", "yelp", "--data_root", ".", "--ckpt_root", "ckpt",
              "--tokenizer_dir", f"{work}/tok", "--model_config", cfgp,
              "--num_epochs", "1", "--batch_size", "2"]

    print("== stage 0: bart_review")
    from multimodalsum_tpu.cli import bart_review

    bart_review.main(common + ["--learning_rate", "1e-3", "--block_size", "32"])

    print("== stage 1: text_pretrain")
    from multimodalsum_tpu.cli import text_pretrain

    text_pretrain.main(common + ["--learning_rate", "1e-3",
                                 "--bart_init", "ckpt/bart-review_yelp"])

    print("== stage 2a: img_pretrain")
    from multimodalsum_tpu.cli import img_pretrain

    img_pretrain.main(common + ["--learning_rate", "1e-3", "--img_model", "tiny",
                                "--bart_init", "ckpt/text_pretrained_yelp"])

    print("== stage 2b: table_pretrain")
    from multimodalsum_tpu.cli import table_pretrain

    table_pretrain.main(common + ["--learning_rate", "1e-3", "--img_model", "tiny",
                                  "--bart_init", "ckpt/text_pretrained_yelp"])

    print("== stage 3: multimodal_train")
    from multimodalsum_tpu.cli import multimodal_train

    multimodal_train.main(common + [
        "--learning_rate", "1e-4", "--img_model", "tiny", "--label_smoothing", "0.1",
        "--bart_init", "ckpt/text_pretrained_yelp",
        "--img_init", "ckpt/img_pretrained_yelp",
        "--table_init", "ckpt/table_pretrained_yelp",
    ])

    print("== eval: test")
    from multimodalsum_tpu.cli import test as test_cli

    test_cli.main(["--dataset", "yelp", "--mode", "dev", "--data_root", ".",
                   "--tokenizer_dir", f"{work}/tok", "--model_config", cfgp,
                   "--img_model", "tiny", "--batch_size", "2",
                   "--multimodal_trained", "ckpt/multimodal_trained_yelp",
                   "--num_beams", "2", "--length_penalty", "1.0",
                   "--max_length", "16", "--output", f"{work}/generated.txt"])
    print("== serving: continuous-batching greedy stream")
    from multimodalsum_tpu.cli import serve as serve_cli

    serve_cli.main(["--dataset", "yelp", "--mode", "dev", "--data_root", ".",
                    "--tokenizer_dir", f"{work}/tok", "--model_config", cfgp,
                    "--img_model", "tiny", "--n_slots", "2",
                    "--multimodal_trained", "ckpt/multimodal_trained_yelp",
                    "--max_length", "16", "--min_length", "2",
                    "--output", f"{work}/generated_serve.txt"])

    print("== serving: beam-search slots (must match offline beam eval)")
    serve_cli.main(["--dataset", "yelp", "--mode", "dev", "--data_root", ".",
                    "--tokenizer_dir", f"{work}/tok", "--model_config", cfgp,
                    "--img_model", "tiny", "--n_slots", "2",
                    "--multimodal_trained", "ckpt/multimodal_trained_yelp",
                    "--num_beams", "2", "--length_penalty", "1.0",
                    "--early_stopping", "--max_length", "16",
                    "--min_length", "0",
                    "--output", f"{work}/generated_serve_beam.txt"])
    # serve strips the byte-BPE leading space that cli.test keeps; compare
    # the stripped text (group order differs: completion vs dataset order)
    beam_served = sorted(
        l.split("\t", 1)[1].strip() for l in
        open(f"{work}/generated_serve_beam.txt").read().splitlines())
    offline_beam = sorted(
        l.strip() for l in open(f"{work}/generated.txt").read().splitlines())
    assert beam_served == offline_beam, (
        "beam serving diverged from offline beam eval")

    print("== serving: prompt-lookup speculative (must match classic greedy)")
    serve_cli.main(["--dataset", "yelp", "--mode", "dev", "--data_root", ".",
                    "--tokenizer_dir", f"{work}/tok", "--model_config", cfgp,
                    "--img_model", "tiny", "--n_slots", "2",
                    "--multimodal_trained", "ckpt/multimodal_trained_yelp",
                    "--max_length", "16", "--min_length", "2",
                    "--spec_window", "4",
                    "--output", f"{work}/generated_serve_spec.txt"])
    classic = dict(l.split("\t", 1) for l in
                   open(f"{work}/generated_serve.txt").read().splitlines())
    spec = dict(l.split("\t", 1) for l in
                open(f"{work}/generated_serve_spec.txt").read().splitlines())
    assert classic == spec, "speculative serving diverged from classic greedy"

    import jax

    if len(jax.local_devices()) < 2:
        # the pool leg only validates routing with >=2 replicas — don't
        # let a 1-device world pass a trivial assertion and claim coverage
        print("== serving: pool leg SKIPPED (needs >=2 devices; set "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
        print("== done; outputs:")
        for line in open(f"{work}/generated.txt").read().splitlines()[:3]:
            print("  ", repr(line[:70]))
        return

    print("== serving: 2-device replica pool (must match classic greedy)")
    serve_cli.main(["--dataset", "yelp", "--mode", "dev", "--data_root", ".",
                    "--tokenizer_dir", f"{work}/tok", "--model_config", cfgp,
                    "--img_model", "tiny", "--n_slots", "1",
                    "--multimodal_trained", "ckpt/multimodal_trained_yelp",
                    "--max_length", "16", "--min_length", "2",
                    "--pool_devices", "2",
                    "--output", f"{work}/generated_serve_pool.txt"])
    pool = dict(l.split("\t", 1) for l in
                open(f"{work}/generated_serve_pool.txt").read().splitlines())
    assert classic == pool, "pooled serving diverged from classic greedy"

    print("== done; outputs:")
    for line in open(f"{work}/generated.txt").read().splitlines()[:3]:
        print("  ", repr(line[:70]))


if __name__ == "__main__":
    main()
