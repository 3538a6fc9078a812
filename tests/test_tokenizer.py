"""Tokenizer parity vs the HF `tokenizers` byte-level BPE implementation."""

import numpy as np
import pytest

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "I love this restaurant, great food and friendly service!",
    "the food was amazing. I'd come back again!!",
    "Best pizza in town -- hands down. 10/10 would recommend.",
    "Terrible experience: cold fries, rude staff, 45 minute wait...",
    "Das Essen war ausgezeichnet, sehr zu empfehlen! éèü",
] * 30


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    hf_tok = pytest.importorskip("tokenizers")
    d = tmp_path_factory.mktemp("bpe")
    t = hf_tok.ByteLevelBPETokenizer()
    t.train_from_iterator(CORPUS, vocab_size=400, min_frequency=1,
                          special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"])
    t.save_model(str(d))

    from multimodalsum_tpu.data.tokenizer import ByteLevelBPETokenizer

    return t, ByteLevelBPETokenizer.from_dir(str(d))


def test_encode_matches_hf_tokenizers(trained):
    hf, mine = trained
    samples = [
        "great food and friendly service!",
        " the quick brown fox",
        "I'd come back again!!",
        "unseen w0rds @#$ éèü",
        "10/10 would recommend.",
    ]
    for s in samples:
        want = hf.encode(s).ids
        got = mine.tokenize_to_ids(s)
        assert got == want, (s, got, want)


def test_roundtrip(trained):
    _, mine = trained
    for s in ["great food!", " leading space", "café — nice"]:
        ids = mine.encode(s, add_special_tokens=True, max_length=32,
                          truncation=True, padding="max_length")
        assert len(ids) == 32
        assert ids[0] == mine.bos_token_id
        assert mine.eos_token_id in ids
        assert mine.decode(ids) == s


def test_native_engine_active_and_equivalent(trained):
    """The C++ merge engine must build in this environment and match the
    pure-Python BPE id-for-id."""
    _, mine = trained
    assert mine._native is not None, "native BPE failed to build/load"
    samples = ["great food!", "I'd come back again!!", "unseen w0rds @#$ éèü"]
    native_ids = [mine.tokenize_to_ids(s) for s in samples]
    saved, mine._native = mine._native, None
    try:
        mine._cache.clear()
        python_ids = [mine.tokenize_to_ids(s) for s in samples]
    finally:
        mine._native = saved
    assert native_ids == python_ids


def test_decode_matches_hf_tokenizers(trained):
    hf, mine = trained
    for s in ["great food and friendly service!", "10/10 would recommend.",
              "Das Essen war ausgezeichnet! éèü"]:
        ids = hf.encode(s).ids
        assert mine.decode(ids, skip_special_tokens=False) == hf.decode(ids)


def test_prefix_space_and_reference_shapes(trained):
    """The data layer's 130-token encode then [1:-1] strip (reference
    src/data_utils.py:48-52)."""
    _, mine = trained
    out = mine("some review text here", add_special_tokens=True, padding="max_length",
               truncation=True, max_length=130, add_prefix_space=True)
    ids = out["input_ids"]
    assert len(ids) == 130 and ids[0] == mine.bos_token_id
    core = ids[1:-1]
    assert len(core) == 128
    assert mine.eos_token_id in core  # eos survives the strip for short text
