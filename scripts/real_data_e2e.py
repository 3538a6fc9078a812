"""End-to-end run on the REAL shipped reference data (VERDICT r1 #8).

Drives the full CLI pipeline — preprocess -> stage 0/1/2a/2b/3 -> cli.test —
on the reference repo's own evaluation corpus
(``/root/reference/data/yelp/test/summaries_0-200_cleaned.csv``: 200 Yelp
businesses x 8 genuine reviews + 1 gold summary each), with a byte-level BPE
tokenizer trained on that real text and the real ROUGE scorer against the
real gold summaries.

The goal is NOT paper ROUGE (no trained bart-large weights exist here and
the model is deliberately small) — it is proving the pipeline survives real
text (unicode, long reviews, contractions), real CSVs, and real group joins,
producing a scored output file.

What is real vs synthesized:
  * review text, review ids, business ids, gold summaries — REAL (shipped);
  * training raw dump — the same real reviews re-serialised in the raw Yelp
    ``reviews.json`` schema, with business ids suffixed ``_tr`` so the
    partition step's test-group exclusion (derived from the gold CSV) does
    not empty the training split, plus 2 repeated reviews per business so
    groups meet the 9-reviews-per-group sampling contract (the real corpus
    ships exactly 8 per business);
  * business metadata and photos — NOT shipped in the reference repo, so
    schema-valid stand-ins are generated (same shapes as production).

Usage:  python scripts/real_data_e2e.py [workdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

REFERENCE_CSV = "/root/reference/data/yelp/test/summaries_0-200_cleaned.csv"


def build_real_raw(root, rng):
    """Raw Yelp-format dumps carrying the REAL shipped reviews."""
    os.makedirs(f"{root}/yelp/raw", exist_ok=True)
    os.makedirs(f"{root}/yelp/raw_others", exist_ok=True)
    os.makedirs(f"{root}/yelp/test", exist_ok=True)

    df = pd.read_csv(REFERENCE_CSV)
    # the eval CSV itself, verbatim, for cli.test / EvalDataset
    df.to_csv(f"{root}/yelp/test/summaries_0-200_cleaned.csv", index=False)

    biz_ids = []
    with open(f"{root}/yelp/raw/reviews.json", "w") as f:
        for k, (_, row) in enumerate(df.iterrows()):
            bid = f"{row['Input.business_id']}_tr"  # dodge test-id exclusion
            biz_ids.append(bid)
            texts = [row[f"Input.original_review_{i}"] for i in range(8)]
            ids = [row[f"Input.original_review_{i}_id"] for i in range(8)]
            # 8 real + 2-4 repeats: satisfies the min-revs subsample rule and
            # the 9-per-group sampling contract, with VARIED per-group counts
            # (the reference percentile filter keeps only groups strictly
            # below the percentile count — uniform counts would drop all)
            n_dup = 2 + (k % 3)
            texts += texts[:n_dup]
            ids += [f"{ids[i]}_dup" for i in range(n_dup)]
            for rid, text in zip(ids, texts):
                f.write(json.dumps(dict(
                    business_id=bid, review_id=str(rid), text=str(text),
                    stars=float(rng.integers(1, 6)))) + "\n")

    # metadata + photos are not shipped; generate schema-valid stand-ins
    with open(f"{root}/yelp/raw_others/business.json", "w") as f:
        for bid in biz_ids + [b[:-3] for b in biz_ids]:  # train + eval ids
            attrs = {
                "BikeParking": "True", "WiFi": "u'free'",
                "NoiseLevel": "u'average'", "Alcohol": "'full_bar'",
                "RestaurantsPriceRange2": str(int(rng.integers(1, 5))),
                "Ambience": str({"casual": True, "classy": False}),
                "GoodForKids": "True", "HasTV": "False",
                "OutdoorSeating": "True", "RestaurantsDelivery": "True",
                "RestaurantsGoodForGroups": "True",
                "RestaurantsReservations": "False",
                "RestaurantsTakeOut": "True", "WheelchairAccessible": "True",
                "BusinessAcceptsCreditCards": "True",
                "ByAppointmentOnly": "False", "Caters": "True",
                "RestaurantsAttire": "'casual'",
                "BusinessParking": str({"garage": False, "street": True,
                                        "validated": False, "lot": True,
                                        "valet": False}),
                "GoodForMeal": str({"dessert": False, "latenight": False,
                                    "lunch": True, "dinner": True,
                                    "brunch": False, "breakfast": False}),
            }
            hours = {d: f"{int(rng.integers(6, 11))}:0-{int(rng.integers(14, 23))}:0"
                     for d in ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday")}
            f.write(json.dumps(dict(
                business_id=bid, name=f"Biz {bid[:6]}",
                stars=float(rng.integers(2, 10)) / 2,
                categories="Restaurants, Food",
                attributes=attrs, hours=hours)) + "\n")

    import tarfile

    from PIL import Image

    tmp_img = f"{root}/_img.jpg"
    Image.fromarray((rng.random((60, 80, 3)) * 255).astype(np.uint8)).save(tmp_img)
    photos = []
    with tarfile.TarFile(f"{root}/yelp/raw_others/yelp_photos.tar", "w") as tar:
        i = 0
        for j, bid in enumerate(biz_ids + [b[:-3] for b in biz_ids]):
            # VARIED photo counts: the prep drops businesses at/above the
            # 90th-percentile count (reference img_modality_preprocessing.py:
            # 29-34, strict <) — a uniform count would equal the percentile
            # and empty photo_dict, starving stage 2a of photo-having groups
            for _ in range(1 + (j % 3) + (3 if j % 7 == 0 else 0)):
                pid = f"photo{i}"
                i += 1
                tar.add(tmp_img, arcname=f"photos/{pid}.jpg")
                photos.append(dict(photo_id=pid, business_id=bid, label="food"))
        pj = f"{root}/_photos.json"
        with open(pj, "w") as fj:
            fj.write("\n".join(json.dumps(p) for p in photos))
        tar.add(pj, arcname="photos.json")


def main():
    # platform pin lives here, NOT at import time — train_real_ckpt.py
    # imports build_real_raw and must keep the default (TPU) backend
    import jax

    jax.config.update("jax_platforms", os.environ.get("MMS_DEMO_PLATFORM", "cpu"))

    import glob
    import tempfile

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mms_real_")
    work = os.path.abspath(work)
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    rng = np.random.default_rng(0)
    print(f"== workdir {work}", flush=True)

    print("== raw dumps from the shipped reference corpus", flush=True)
    build_real_raw(work, rng)

    print("== preprocess (text DAG + multimodal)", flush=True)
    from multimodalsum_tpu.cli import preprocess

    # real reviews run 30-200+ words; keep them (the reference's 70-token
    # cap is tuned for the full million-review dump, not this 2k subset)
    preprocess.main(["text", "--dataset", "yelp", "--data_root", ".",
                     "--raw", f"{work}/yelp/raw/reviews.json",
                     "--min_revs", "9", "--min_rev_len", "5",
                     "--max_rev_len", "400", "--percentile", "100",
                     "--train_part", "0.85", "--val_part", "0.15"])
    preprocess.main(["multimodal", "--dataset", "yelp", "--data_root", "."])

    print("== tokenizer: byte-level BPE trained on the real reviews", flush=True)
    from multimodalsum_tpu.data.tokenizer import train_bpe
    from multimodalsum_tpu.pipeline.textprep import read_group_csv

    corpus = []
    for fp in glob.glob(f"{work}/yelp/5.text/*/*.csv"):
        corpus.extend(r["review_text"] for r in read_group_csv(fp))
    print(f"   corpus: {len(corpus)} real reviews", flush=True)
    train_bpe(corpus, 3000, f"{work}/tok")

    cfgp = f"{work}/small.json"
    json.dump(dict(vocab_size=3000, d_model=128, encoder_layers=2,
                   decoder_layers=2, encoder_attention_heads=4,
                   decoder_attention_heads=4, encoder_ffn_dim=256,
                   decoder_ffn_dim=256, max_position_embeddings=512,
                   dropout=0.1), open(cfgp, "w"))

    common = ["--dataset", "yelp", "--data_root", ".", "--ckpt_root", "ckpt",
              "--tokenizer_dir", f"{work}/tok", "--model_config", cfgp,
              "--num_epochs", "1", "--batch_size", "4",
              # bounded smoke: stage 2a/2b expand to 9 items/group (the r2
              # reference-parity dataset layout) and stage 3 is the full
              # model — uncapped epochs take hours on CPU without proving
              # anything extra; every stage still validates + checkpoints
              "--max_steps_per_epoch", "40"]

    print("== stage 1: text_pretrain on real reviews", flush=True)
    from multimodalsum_tpu.cli import text_pretrain

    text_pretrain.main(common + ["--learning_rate", "1e-3"])

    print("== stage 2a/2b: img + table pretrain", flush=True)
    from multimodalsum_tpu.cli import img_pretrain, table_pretrain

    img_pretrain.main(common + ["--learning_rate", "1e-3", "--img_model", "tiny",
                                "--bart_init", "ckpt/text_pretrained_yelp"])
    table_pretrain.main(common + ["--learning_rate", "1e-3", "--img_model", "tiny",
                                  "--bart_init", "ckpt/text_pretrained_yelp"])

    print("== stage 3: multimodal_train", flush=True)
    from multimodalsum_tpu.cli import multimodal_train

    multimodal_train.main(common + [
        "--learning_rate", "1e-4", "--img_model", "tiny",
        "--label_smoothing", "0.1",
        "--bart_init", "ckpt/text_pretrained_yelp",
        "--img_init", "ckpt/img_pretrained_yelp",
        "--table_init", "ckpt/table_pretrained_yelp",
    ])

    print("== eval: cli.test on the REAL gold set (real scorer)", flush=True)
    from multimodalsum_tpu.cli import test as test_cli

    test_cli.main(["--dataset", "yelp", "--mode", "dev", "--data_root", ".",
                   "--tokenizer_dir", f"{work}/tok", "--model_config", cfgp,
                   "--img_model", "tiny", "--batch_size", "4",
                   "--multimodal_trained", "ckpt/multimodal_trained_yelp",
                   "--num_beams", "5", "--length_penalty", "2.0",
                   "--max_length", "64", "--min_length", "8",
                   "--output", f"{work}/generated_real.txt"])

    out = open(f"{work}/generated_real.txt").read().splitlines()
    print(f"== done; {len(out)} summaries scored against real gold; first:",
          flush=True)
    print("  ", repr(out[0][:100]))


if __name__ == "__main__":
    main()
