"""Train a REAL-corpus bart-large checkpoint in-environment (VERDICT r2 #1).

Overfit-trains the full-geometry model (d_model 1024, 12+12 layers, vocab
50265 — the exact shapes `bench.py` measures) through stages 1 -> 2a/2b -> 3
on the reference repo's own 200-business Yelp corpus
(`/root/reference/data/yelp/test/summaries_0-200_cleaned.csv`, the same
real-text source `scripts/real_data_e2e.py` uses). Overfitting is the POINT:
the deliverable is *peaked logits* so the int8/int4 quantization quality gate
(reference metric contract: ``src/test.py:222-236``) measures real divergence
instead of single-ULP coin flips on near-uniform random-init logits.

The tokenizer is a byte-level BPE trained on the corpus (no pretrained BART
assets exist in this offline environment); the model keeps the full 50265
vocab so throughput geometry is identical to the headline bench config.

Stages are skipped when their checkpoint already reports the target epoch —
re-running after an interruption resumes at the first unfinished stage.

Usage:
  python scripts/train_real_ckpt.py [workdir]       # full run (~1 h on chip)
  SMOKE=1 python scripts/train_real_ckpt.py [wd]    # wiring check (~5 min)

``STAGE3_EPOCHS=N STAGE3_CKPT_ROOT=ckpt_valmin`` re-runs ONLY stage 3 (the
pretraining stages are reused from the existing checkpoints) to a different
epoch count into a separate checkpoint root, saving once at the end.
Normally unnecessary: the main run snapshots its best-validation stage-3
save into ``ckpt_valmin/`` as it goes (make_snapshot_save below) — the
val-min checkpoint is the honest one for gold-ROUGE comparisons, while the
overfit end-of-run one is the right basis for the quantization gate's
peaked logits.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = bool(int(os.environ.get("SMOKE", "0")))

# epochs per stage. Stage 1 memorises the small real corpus fast (measured
# 2026-08-20: train loss 0.27 by epoch 52 at 10 steps/epoch) — 60 epochs is
# already deep overfit; the gate's peaked logits come from stage 3 anyway.
EPOCHS = dict(stage1=2, stage2a=1, stage2b=1, stage3=2) if SMOKE else dict(
    stage1=60, stage2a=3, stage2b=3, stage3=70)
SAVE_IV = dict(stage1=2, stage2a=1, stage2b=1, stage3=2) if SMOKE else dict(
    stage1=45, stage2a=3, stage2b=3, stage3=23)  # saves cost ~5 min EACH over
# the device tunnel (full bart-large state device->host); intermediates are
# resume insurance only, so keep them sparse. Stage 3 saves at epochs
# 23/46/69 — the best-val one of those is snapshotted into ckpt_valmin/
# during the SAME run (make_snapshot_save below), so the honest
# learning-evidence checkpoint never needs a separate STAGE3_EPOCHS re-run

# val-min variant (see module docstring): different stage-3 epoch budget
# into a different ckpt root, one save at the end
if os.environ.get("STAGE3_EPOCHS"):
    EPOCHS["stage3"] = int(os.environ["STAGE3_EPOCHS"])
    SAVE_IV["stage3"] = EPOCHS["stage3"]
STAGE3_CKPT_ROOT = os.environ.get("STAGE3_CKPT_ROOT", "ckpt")
BATCH = 8          # the reference stage-3 global batch (README.md:139-140)
VOCAB = 50265      # full bart-large head geometry; the corpus caps the BPE
                   # at fewer real merges, unused tail ids train toward -inf


def make_snapshot_save(real_save, valmin_root: str = "ckpt_valmin"):
    """Wrap a ``save_checkpoint``-shaped callable so the best-validation save
    (lowest ``val_loss`` seen so far) is additionally copied into
    ``valmin_root/<ckpt basename>``.

    Stage 3 deliberately overfits past the val minimum (peaked logits for the
    quantization gate); the copy preserves the honest learning-evidence
    checkpoint that ``bench.py``'s gate "valmin" section scores, without a
    separate STAGE3_EPOCHS=55 re-run. Installed by rebinding
    ``cli.multimodal_train.save_checkpoint`` — the CLI's save hook resolves
    that name from its module globals at call time."""
    import shutil

    best = {"vl": float("inf")}
    # seed from an existing snapshot so a crash+retry mid-stage-3 (the
    # retry re-runs this script with a fresh `best`) can't overwrite a
    # better earlier-attempt snapshot with a worse post-minimum save
    for prev in glob.glob(os.path.join(valmin_root, "*", "meta.json")):
        try:
            vl_prev = json.load(open(prev)).get("val_loss")
            if vl_prev is not None:
                best["vl"] = min(best["vl"], float(vl_prev))
        except (ValueError, TypeError):
            pass

    def save_and_snapshot(ckpt_dir, st, **kw):
        out = real_save(ckpt_dir, st, **kw)
        vl = kw.get("val_loss")
        if vl is not None and vl < best["vl"]:
            best["vl"] = vl
            dst = os.path.join(valmin_root, os.path.basename(ckpt_dir))
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(ckpt_dir, dst)
            print(f"== snapshotted best-val save (epoch {kw.get('epoch', '?')},"
                  f" val {vl:.4f}) -> {dst}", flush=True)
        return out

    return save_and_snapshot


def resume_args(ckpt_dir: str) -> list:
    """Auto-resume an interrupted stage from its last complete save. The
    stage CLIs only resume when ``--resume`` is passed explicitly — without
    this, a killed session restarts the stage from scratch (a 45-epoch
    stage-1 save was re-trained from epoch 0 exactly that way). Packed
    (opt_state-less) checkpoints can never reach here: packs materialise
    only stage-COMPLETE saves, which ``stage_done`` skips first."""
    if os.path.exists(os.path.join(ckpt_dir, "meta.json")):
        return ["--resume", ckpt_dir]
    return []


def stage_done(ckpt_dir: str, target_epochs: int) -> bool:
    meta = os.path.join(ckpt_dir, "meta.json")
    if not os.path.exists(meta):
        return False
    try:
        return int(json.load(open(meta)).get("epoch", -1)) >= target_epochs - 1
    except (ValueError, TypeError):
        return False


def main():
    work = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else
                           os.path.join(os.path.dirname(__file__), "..",
                                        "_work", "real_ckpt"))
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    print(f"== workdir {work} (smoke={SMOKE})", flush=True)

    # a committed pack (scripts/ckpt_pack.py) seeds any stages a previous
    # session finished before the gitignored _work/ tree was cleaned —
    # complete on-disk checkpoints always win over the pack
    if not SMOKE:
        from scripts.ckpt_pack import DEFAULT_PACK, unpack

        if os.path.isdir(DEFAULT_PACK):
            seeded = unpack(DEFAULT_PACK, work)
            if seeded:
                print(f"== seeded from assets pack: {seeded}", flush=True)

    import numpy as np

    # ---- data: identical construction to scripts/real_data_e2e.py ---------
    if not os.path.exists(f"{work}/yelp/raw/reviews.json"):
        from scripts.real_data_e2e import build_real_raw

        print("== building raw dumps from the shipped reference corpus", flush=True)
        build_real_raw(work, np.random.default_rng(0))

    if not os.path.exists(f"{work}/yelp/meta.csv"):
        print("== preprocess (text DAG + multimodal)", flush=True)
        from multimodalsum_tpu.cli import preprocess

        preprocess.main(["text", "--dataset", "yelp", "--data_root", ".",
                         "--raw", f"{work}/yelp/raw/reviews.json",
                         "--min_revs", "9", "--min_rev_len", "5",
                         "--max_rev_len", "400", "--percentile", "100",
                         "--train_part", "0.85", "--val_part", "0.15"])
        preprocess.main(["multimodal", "--dataset", "yelp", "--data_root", "."])

    if not os.path.exists(f"{work}/tok/vocab.json"):
        print("== training byte-level BPE on the real reviews", flush=True)
        from multimodalsum_tpu.data.tokenizer import train_bpe
        from multimodalsum_tpu.pipeline.textprep import read_group_csv

        corpus = []
        for fp in glob.glob(f"{work}/yelp/5.text/*/*.csv"):
            corpus.extend(r["review_text"] for r in read_group_csv(fp))
        tok = train_bpe(corpus, VOCAB, f"{work}/tok")
        print(f"   corpus {len(corpus)} reviews -> BPE vocab {tok.vocab_size} "
              f"(model head stays {VOCAB})", flush=True)

    common = ["--dataset", "yelp", "--data_root", ".", "--ckpt_root", "ckpt",
              "--tokenizer_dir", f"{work}/tok", "--bf16",
              "--batch_size", str(BATCH), "--max_grad_norm", "1.0"]
    if SMOKE:
        common += ["--max_steps_per_epoch", "3"]

    def run(stage, fn, argv):
        t0 = time.time()
        fn(argv)
        print(f"== {stage} done in {time.time() - t0:.0f}s", flush=True)

    # ---- stage 1: text pretraining at bart-large geometry ------------------
    if stage_done("ckpt/text_pretrained_yelp", EPOCHS["stage1"]):
        print("== stage 1 already complete, skipping", flush=True)
    else:
        from multimodalsum_tpu.cli import text_pretrain

        run("stage 1 (text_pretrain)", text_pretrain.main, common
            + resume_args("ckpt/text_pretrained_yelp") + [
            "--num_epochs", str(EPOCHS["stage1"]),
            "--save_interval", str(SAVE_IV["stage1"]),
            "--learning_rate", "1e-4", "--warmup_ratio", "0.1",
            # NO --workers: the fork-pool wedged a long run at epoch 12
            # (pool.map never returned; forked child inherited a lock from
            # the multithreaded JAX parent). Inline tokenization costs ~ms
            # against a ~0.3 s device step.
            "--metrics_log", f"{work}/metrics_stage1.jsonl"])

    # ---- stage 2a/2b: img + table pretraining (frozen text decoder pivot) --
    if stage_done("ckpt/img_pretrained_yelp", EPOCHS["stage2a"]):
        print("== stage 2a already complete, skipping", flush=True)
    else:
        from multimodalsum_tpu.cli import img_pretrain

        run("stage 2a (img_pretrain)", img_pretrain.main, common
            + resume_args("ckpt/img_pretrained_yelp") + [
            "--num_epochs", str(EPOCHS["stage2a"]),
            "--save_interval", str(SAVE_IV["stage2a"]),
            "--learning_rate", "1e-4",
            "--bart_init", "ckpt/text_pretrained_yelp",
            "--metrics_log", f"{work}/metrics_stage2a.jsonl"])

    if stage_done("ckpt/table_pretrained_yelp", EPOCHS["stage2b"]):
        print("== stage 2b already complete, skipping", flush=True)
    else:
        from multimodalsum_tpu.cli import table_pretrain

        run("stage 2b (table_pretrain)", table_pretrain.main, common
            + resume_args("ckpt/table_pretrained_yelp") + [
            "--num_epochs", str(EPOCHS["stage2b"]),
            "--save_interval", str(SAVE_IV["stage2b"]),
            "--learning_rate", "1e-4",
            "--bart_init", "ckpt/text_pretrained_yelp",
            "--metrics_log", f"{work}/metrics_stage2b.jsonl"])

    # ---- stage 3: end-to-end multimodal training ----------------------------
    s3 = f"{STAGE3_CKPT_ROOT}/multimodal_trained_yelp"
    if stage_done(s3, EPOCHS["stage3"]):
        print("== stage 3 already complete, skipping", flush=True)
    else:
        from multimodalsum_tpu.cli import multimodal_train

        if STAGE3_CKPT_ROOT == "ckpt" and not SMOKE:
            # Preserve the best-val save as ckpt_valmin/ while this run
            # overfits past it (see make_snapshot_save)
            multimodal_train.save_checkpoint = make_snapshot_save(
                multimodal_train.save_checkpoint)

        # note: --ckpt_root only redirects the stage-3 OUTPUT; the
        # pretraining inits always come from the canonical ckpt/ tree
        run("stage 3 (multimodal_train)",
            multimodal_train.main,
            [a if a != "ckpt" else STAGE3_CKPT_ROOT
             for a in common] + resume_args(s3) + [
            "--num_epochs", str(EPOCHS["stage3"]),
            "--save_interval", str(SAVE_IV["stage3"]),
            "--learning_rate", "5e-5", "--label_smoothing", "0.1",
            "--bart_init", "ckpt/text_pretrained_yelp",
            "--img_init", "ckpt/img_pretrained_yelp",
            "--table_init", "ckpt/table_pretrained_yelp",
            "--metrics_log",
            f"{work}/metrics_stage3_{STAGE3_CKPT_ROOT}.jsonl"
            if STAGE3_CKPT_ROOT != "ckpt" else
            f"{work}/metrics_stage3.jsonl"])

    print(f"== all stages complete; checkpoint: {work}/{s3}", flush=True)


if __name__ == "__main__":
    main()
