"""End-to-end offline preprocessing pipeline test on synthetic raw dumps."""

import gzip
import json
import os
import tarfile

import numpy as np
import pandas as pd
import pytest


def _make_yelp_raw(root, rng, n_biz=25, revs=(12, 30)):
    os.makedirs(f"{root}/yelp/raw_others", exist_ok=True)
    os.makedirs(f"{root}/yelp/raw", exist_ok=True)
    os.makedirs(f"{root}/yelp/test", exist_ok=True)
    words = ["great", "food", "nice", "slow", "pizza", "love", "meh", "service",
             "wow", "bad", "tasty", "clean", "cozy", "fresh", "warm"]

    # reviews.json
    with open(f"{root}/yelp/raw/reviews.json", "w") as f:
        for b in range(n_biz):
            for r in range(int(rng.integers(*revs))):
                text = " ".join(rng.choice(words, int(rng.integers(12, 40)))) + "."
                f.write(json.dumps(dict(
                    business_id=f"biz{b}", review_id=f"rev{b}_{r}",
                    text=text, stars=float(rng.integers(1, 6)))) + "\n")

    # business.json with attributes + hours
    with open(f"{root}/yelp/raw_others/business.json", "w") as f:
        for b in range(n_biz):
            attrs = {
                "BikeParking": "True" if rng.random() > 0.5 else "False",
                "WiFi": "u'free'",
                "NoiseLevel": "u'average'",
                "Alcohol": "'full_bar'",
                "RestaurantsPriceRange2": str(int(rng.integers(1, 5))),
                "Ambience": str({"casual": bool(rng.random() > 0.5),
                                 "classy": False}),
                "GoodForKids": "True",
                "HasTV": "False",
                "OutdoorSeating": "True",
                "RestaurantsDelivery": "True",
                "RestaurantsGoodForGroups": "True",
                "RestaurantsReservations": "False",
                "RestaurantsTakeOut": "True",
                "WheelchairAccessible": "True",
                "BusinessAcceptsCreditCards": "True",
                "ByAppointmentOnly": "False",
                "Caters": "True",
                "RestaurantsAttire": "'casual'",
                "BusinessParking": str({"garage": False, "street": True,
                                        "validated": False, "lot": True,
                                        "valet": False}),
                "GoodForMeal": str({"dessert": False, "latenight": False,
                                    "lunch": True, "dinner": True,
                                    "brunch": False, "breakfast": False}),
            }
            hours = {d: f"{int(rng.integers(6,11))}:0-{int(rng.integers(14,23))}:0"
                     for d in ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday"]}
            f.write(json.dumps(dict(
                business_id=f"biz{b}", name=f"Cafe {b}",
                stars=float(rng.integers(2, 10)) / 2,
                categories="Pizza, Bars, Food",
                attributes=attrs, hours=hours)) + "\n")

    # photos tar + photos.json
    from PIL import Image

    tmp_img = f"{root}/_img.jpg"
    Image.fromarray((rng.random((60, 80, 3)) * 255).astype(np.uint8)).save(tmp_img)
    photos = []
    with tarfile.TarFile(f"{root}/yelp/raw_others/yelp_photos.tar", "w") as tar:
        for b in range(0, n_biz, 2):
            for k in range(int(rng.integers(1, 4))):
                pid = f"photo{b}_{k}"
                photos.append(dict(business_id=f"biz{b}", photo_id=pid))
                tar.add(tmp_img, arcname=f"photos/{pid}.jpg")
        pj = f"{root}/_photos.json"
        with open(pj, "w") as jf:
            jf.write("\n".join(json.dumps(p) for p in photos))
        tar.add(pj, arcname="photos.json")

    # gold eval CSV: first 4 businesses become test-excluded
    rows = []
    for b in range(4):
        row = {"Input.business_id": f"biz{b}"}
        for r in range(8):
            row[f"Input.original_review_{r}"] = "some review text here."
        row["Answer.summary"] = "a summary."
        rows.append(row)
    pd.DataFrame(rows).to_csv(f"{root}/yelp/test/summaries_0-200_cleaned.csv", index=False)


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    rng = np.random.default_rng(0)
    _make_yelp_raw(root, rng)

    from multimodalsum_tpu.pipeline.multimodal_prep import run_multimodal_pipeline
    from multimodalsum_tpu.pipeline.textprep import run_text_pipeline

    run_text_pipeline("yelp", [f"{root}/yelp/raw/reviews.json"], root,
                      min_revs=5, min_rev_len=5, max_rev_len=70, percentile=95)
    run_multimodal_pipeline(root, "yelp", log=lambda *a: None)
    return root


def test_stage_outputs_exist(pipeline_root):
    root = pipeline_root
    for sub in ("1.prep/reviews", "2.tok/reviews", "3.subsam/reviews",
                "4.part/train", "4.part/val", "5.text/train"):
        path = os.path.join(root, "yelp", sub)
        assert os.path.isdir(path) and os.listdir(path), sub
    assert os.path.exists(f"{root}/yelp/meta.csv")
    assert os.path.exists(f"{root}/yelp/photo_dict.pickle")
    assert os.path.exists(f"{root}/yelp/photo_business_dict.pickle")


def test_test_groups_excluded(pipeline_root):
    root = pipeline_root
    import glob

    train_ids = {os.path.basename(p)[:-4]
                 for p in glob.glob(f"{root}/yelp/4.part/*/*.csv")}
    for b in range(4):
        assert f"biz{b}" not in train_ids


def test_meta_schema(pipeline_root):
    from multimodalsum_tpu.pipeline.multimodal_prep import YELP_FIELDS

    meta = pd.read_csv(f"{pipeline_root}/yelp/meta.csv", sep="\t", na_filter=False,
                       dtype=str)
    assert list(meta.columns) == YELP_FIELDS
    assert len(meta) > 0
    # rating is a 4-bit binary string; hours are cluster labels or ''
    assert all(len(r) == 4 and set(r) <= {"0", "1"} for r in meta["ratings"])


def test_stores_load_pipeline_output(pipeline_root):
    """The runtime data layer must consume the pipeline's outputs directly."""
    from multimodalsum_tpu.data.multimodal_data import MultimodalStore
    from multimodalsum_tpu.data.tokenizer import train_bpe

    tok = train_bpe(["great food nice slow pizza love meh service"] * 50, 300,
                    os.path.join(pipeline_root, "_tok"))
    store = MultimodalStore(pipeline_root, "yelp", "train", reviews_per_group=3)
    assert len(store) > 0
    ex = store.example(0, tok, max_length=20)
    assert ex["reviews"].shape == (3, 18)
    assert ex["field_values"]["rating"].shape == (4,)
    assert ex["img"].shape == (10, 224, 224, 3)


def test_tokenize_roundtrip_moses(pipeline_root):
    """2.tok review_text must be Moses-tokenized (spaces around punctuation)."""
    import glob

    fp = sorted(glob.glob(f"{pipeline_root}/yelp/2.tok/reviews/*.csv"))[0]
    from multimodalsum_tpu.pipeline.textprep import read_group_csv

    rows = read_group_csv(fp)
    assert any(r["review_text"].endswith(" .") for r in rows)
