"""Toolkit pipeline tests, modeled on the reference's mldp test strategy
(``mltoolkit/mldp/tests``): worker-count sweep, negative validation over step
permutations, fakes injecting failure modes, per-step unit tests."""

import itertools
import os

import numpy as np
import pytest

from multimodalsum_tpu.toolkit.chunk import DataChunk, InvalidChunkError
from multimodalsum_tpu.toolkit.pipeline import Pipeline, PipelineError
from multimodalsum_tpu.toolkit.steps import (
    ChunkAccumulator,
    ChunkShuffler,
    ChunkSorter,
    CsvReader,
    FieldRenamer,
    FieldSelector,
    FunctionApplier,
    JsonReader,
    NumpyFormatter,
    Padder,
    PandasFormatter,
    SeqLenComputer,
    TokenProcessor,
    Transformer,
    VocabMapper,
)
from multimodalsum_tpu.toolkit.vocabulary import Vocabulary

# ---------------------------------------------------------------------------
# fakes (reference tests/pipeline/comps)


class EmptyChunkTransformer(Transformer):
    """Returns an empty chunk every Nth call."""

    def __init__(self, every: int = 2):
        self.every = every
        self._n = 0

    def __call__(self, chunk):
        self._n += 1
        if self._n % self.every == 0:
            return DataChunk()
        return chunk


class InvalidTransformer(Transformer):
    """Produces a structurally broken chunk."""

    def __call__(self, chunk):
        bad = DataChunk(**chunk.fields())
        first = list(bad.keys())[0]
        bad._data[first] = bad[first][:-1]  # force a length mismatch
        return bad


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    rng = np.random.default_rng(0)
    words = ["red", "green", "blue", "ochre", "teal"]
    for f in range(4):
        with open(d / f"part{f}.csv", "w") as fh:
            fh.write("id,text,score\n")
            for i in range(25):
                text = " ".join(rng.choice(words, rng.integers(2, 6)))
                fh.write(f"{f}_{i},{text},{int(rng.integers(0, 100))}\n")
    return str(d)


def _count_units(items):
    return sum(len(next(iter(it.values()))) for it in items)


# ---------------------------------------------------------------------------
# integration: worker sweep (reference test_integration.py:26-43)


@pytest.mark.parametrize("workers", [0, 1, 2, 3, 4])
def test_pipeline_worker_sweep(csv_dir, workers):
    vocab = Vocabulary().build([["red", "green", "blue", "ochre", "teal"]] * 2)
    pipe = Pipeline(
        CsvReader(chunk_size=7),
        [
            TokenProcessor(["text"]),
            VocabMapper({"text": vocab}),
            SeqLenComputer("text"),
            Padder(["text"], pad_value=0, max_length=8),
            ChunkAccumulator(10),
        ],
        NumpyFormatter(),
        worker_processes_num=workers,
    )
    items = list(pipe.iter(os.path.join(csv_dir, "*.csv")))
    assert _count_units(items) == 100
    for it in items:
        assert it["text"].shape[1] == 8
        assert set(it.keys()) == {"id", "text", "text_mask", "score", "text_len"}
    # serial run is the ground truth: same multiset of unit ids
    serial = list(Pipeline(CsvReader(chunk_size=7), [], NumpyFormatter()).iter(
        os.path.join(csv_dir, "*.csv")))
    ids = sorted(np.concatenate([i["id"] for i in items]).tolist())
    want = sorted(np.concatenate([i["id"] for i in serial]).tolist())
    assert ids == want


def test_empty_chunk_suppression(csv_dir):
    """Empty chunks never reach the consumer (reference test_integration.py:45-61)."""
    pipe = Pipeline(CsvReader(chunk_size=5), [EmptyChunkTransformer(every=2)],
                    NumpyFormatter())
    items = list(pipe.iter(os.path.join(csv_dir, "part0.csv")))
    assert all(len(next(iter(it.values()))) > 0 for it in items)
    assert _count_units(items) == 15  # half the chunks emptied (25 rows / 5 -> 5 chunks, 2 emptied)


def test_invalid_chunk_detected(csv_dir):
    pipe = Pipeline(CsvReader(chunk_size=5), [InvalidTransformer()], NumpyFormatter())
    with pytest.raises(InvalidChunkError):
        list(pipe.iter(os.path.join(csv_dir, "part0.csv")))


def test_worker_error_propagates(csv_dir):
    pipe = Pipeline(CsvReader(chunk_size=5), [InvalidTransformer()],
                    NumpyFormatter(), worker_processes_num=2)
    with pytest.raises(PipelineError):
        list(pipe.iter(os.path.join(csv_dir, "*.csv")))


# ---------------------------------------------------------------------------
# negative construction tests over step-order permutations
# (reference test_validation.py:52-60)


def test_invalid_step_orders():
    reader = CsvReader()
    trans = TokenProcessor(["text"])
    fmt = NumpyFormatter()
    # every arrangement that puts a non-Reader first or a non-middle in the
    # middle must raise at construction
    for first, middle in itertools.permutations([reader, trans, fmt], 2):
        if isinstance(first, CsvReader) and isinstance(middle, TokenProcessor):
            continue  # the valid order
        with pytest.raises(ValueError):
            Pipeline(first, [middle])


def test_missing_source_raises():
    with pytest.raises(FileNotFoundError):
        list(Pipeline(CsvReader(), [], NumpyFormatter()).iter("/nonexistent/*.csv"))


# ---------------------------------------------------------------------------
# unit tests per step (reference tests/transformers, tests/readers...)


def test_json_reader(tmp_path):
    import json

    p = tmp_path / "a.jsonl"
    with open(p, "w") as f:
        for i in range(7):
            f.write(json.dumps({"x": i, "tags": ["a"] * (i % 3)}) + "\n")
    chunks = list(JsonReader(chunk_size=3).iter_chunks(str(p)))
    assert [len(c) for c in chunks] == [3, 3, 1]
    assert chunks[0]["tags"].dtype == object


def test_field_selector_renamer():
    c = DataChunk(a=[1, 2], b=[3, 4], c=[5, 6])
    out = FieldSelector(["a", "c"])(c)
    assert set(out.keys()) == {"a", "c"}
    out = FieldRenamer({"a": "x"})(c)
    assert set(out.keys()) == {"x", "b", "c"}


def test_padder_and_seq_len():
    c = DataChunk(ids=np.asarray([[1, 2, 3], [4], [5, 6]], dtype=object))
    c = SeqLenComputer("ids")(c)
    np.testing.assert_array_equal(c["ids_len"], [3, 1, 2])
    out = Padder(["ids"], pad_value=9)(c)
    np.testing.assert_array_equal(out["ids"], [[1, 2, 3], [4, 9, 9], [5, 6, 9]])
    np.testing.assert_array_equal(out["ids_mask"], [[1, 1, 1], [1, 0, 0], [1, 1, 0]])


def test_chunk_sorter():
    c = DataChunk(k=[3, 1, 2], v=["c", "a", "b"])
    out = ChunkSorter("k")(c)
    assert out["v"].tolist() == ["a", "b", "c"]
    out = ChunkSorter("k", descending=True)(c)
    assert out["v"].tolist() == ["c", "b", "a"]


def test_function_applier():
    c = DataChunk(t=["ab", "cde"])
    out = FunctionApplier({"t": len})(c)
    assert out["t"].tolist() == [2, 3]


def test_chunk_accumulator_rebatches():
    chunks = [DataChunk(x=np.arange(i * 10, i * 10 + 4)) for i in range(5)]
    out = list(ChunkAccumulator(6)(iter(chunks)))
    assert [len(c) for c in out] == [6, 6, 6, 2]
    merged = np.concatenate([c["x"] for c in out])
    np.testing.assert_array_equal(np.sort(merged), np.sort(
        np.concatenate([c["x"] for c in chunks])))


def test_chunk_shuffler_preserves_multiset():
    chunks = [DataChunk(x=[i]) for i in range(20)]
    out = list(ChunkShuffler(buffer_size=8, seed=3)(iter(chunks)))
    got = sorted(int(c["x"][0]) for c in out)
    assert got == list(range(20))


def test_pandas_formatter():
    import pandas as pd

    df = PandasFormatter()(DataChunk(a=[1, 2], b=["x", "y"]))
    assert isinstance(df, pd.DataFrame) and list(df.columns) == ["a", "b"]


# ---------------------------------------------------------------------------
# vocabulary & chunk core (reference tests/utils)


def test_vocabulary_roundtrip(tmp_path):
    v = Vocabulary().build([["a", "b", "a", "c"], ["a", "b"]], min_count=1)
    assert v["a"].count == 3
    assert v.ids(["a", "zzz"])[1] == v["<unk>"].id
    path = str(tmp_path / "v.txt")
    v.save(path)
    v2 = Vocabulary.load(path)
    assert len(v2) == len(v)
    assert v2.tokens(v.ids(["a", "b", "c"])) == ["a", "b", "c"]


def test_datachunk_validation_and_equality():
    c = DataChunk(a=[1, 2], b=[3, 4])
    assert len(c) == 2 and c.valid
    c2 = DataChunk(a=[1, 2], b=[3, 4])
    assert c == c2
    bad = DataChunk(a=[1, 2])
    bad._data["b"] = np.asarray([1])
    assert not bad.valid
    with pytest.raises(InvalidChunkError):
        bad.validate()


def test_fs_accessors(tmp_path):
    """Local accessor roundtrip + S3 accessor against a fake client
    (reference mlutils fs_accessors)."""
    from multimodalsum_tpu.toolkit.fs import (LocalFsAccessor, S3FsAccessor,
                                              get_accessor)

    fs = LocalFsAccessor()
    p = str(tmp_path / "a" / "b.txt")
    with fs.open(p, "w") as f:       # auto-creates parent dirs
        f.write("hello")
    assert fs.exists(p)
    with fs.open(p) as f:
        assert f.read() == "hello"
    assert fs.glob(str(tmp_path / "a" / "*.txt")) == [p]
    fs.copy(p, str(tmp_path / "a" / "c.txt"))
    assert fs.listdir(str(tmp_path / "a")) == ["b.txt", "c.txt"]
    fs.remove(p)
    assert not fs.exists(p)
    assert isinstance(get_accessor("/x/y"), LocalFsAccessor)

    class FakeS3:
        def __init__(self):
            self.store = {}
        def put_object(self, Bucket, Key, Body):
            self.store[Key] = Body
        def get_object(self, Bucket, Key):
            import io
            return {"Body": io.BytesIO(self.store[Key])}
        def head_object(self, Bucket, Key):
            # mimic botocore: 404 ClientError with a response dict
            if Key not in self.store:
                e = Exception("Not Found")
                e.response = {"ResponseMetadata": {"HTTPStatusCode": 404}}
                raise e
            return {"ContentLength": len(self.store[Key])}
        def list_objects_v2(self, Bucket, Prefix, MaxKeys=1000,
                            ContinuationToken=None):
            keys = sorted(k for k in self.store if k.startswith(Prefix))
            if ContinuationToken:
                keys = [k for k in keys if k > ContinuationToken]
            page, rest = keys[:2], keys[2:]  # tiny pages exercise pagination
            out = {"Contents": [{"Key": k} for k in page]}
            if rest:
                out["IsTruncated"] = True
                out["NextContinuationToken"] = page[-1]
            return out
        def delete_object(self, Bucket, Key):
            self.store.pop(Key, None)

    s3 = S3FsAccessor("bkt", client=FakeS3())
    w = s3.open("dir/x.txt", "w")
    w.write("payload")
    w.close()
    w.close()  # IOBase contract: close is idempotent (no re-upload / raise)
    assert s3.exists("dir/x.txt")
    assert not s3.exists("dir/x.tx")      # exact key, not prefix match
    with s3.open("dir/x.txt") as f:
        assert f.read() == "payload"
    with s3.open("dir/sub/deep.txt", "w") as f:
        f.write("nested")
    # listdir: immediate children only, basenames — like LocalFsAccessor
    assert s3.listdir("dir") == ["sub", "x.txt"]
    # glob: * must not cross "/" boundaries — like local glob
    assert s3.glob("dir/*.txt") == ["dir/x.txt"]
    assert s3.glob("dir/*/*.txt") == ["dir/sub/deep.txt"]
    s3.remove("dir/x.txt")
    assert not s3.exists("dir/x.txt")


def test_chunk_collector_merges_and_strictness():
    from multimodalsum_tpu.toolkit.steps import ChunkCollector

    chunks = [DataChunk(x=np.arange(i * 3, i * 3 + 3)) for i in range(5)]
    strict = list(ChunkCollector(2)(iter(chunks)))
    # 5 chunks -> two merged pairs; the trailing incomplete buffer is dropped
    assert [len(c) for c in strict] == [6, 6]
    np.testing.assert_array_equal(strict[0]["x"], np.arange(6))
    lenient = list(ChunkCollector(2, strict=False)(iter(chunks)))
    assert [len(c) for c in lenient] == [6, 6, 3]
    np.testing.assert_array_equal(lenient[-1]["x"], np.arange(12, 15))


def test_unit_collector_bounded_and_unbounded():
    from multimodalsum_tpu.toolkit.steps import UnitCollector

    chunks = [DataChunk(x=np.arange(i * 4, i * 4 + 4)) for i in range(3)]
    bounded = list(UnitCollector(5)(iter(chunks)))
    assert [len(c) for c in bounded] == [5, 5, 2]
    merged = list(UnitCollector(None)(iter(
        DataChunk(x=np.arange(i * 4, i * 4 + 4)) for i in range(3))))
    assert len(merged) == 1 and len(merged[0]) == 12
    np.testing.assert_array_equal(merged[0]["x"], np.arange(12))


def test_postfixer_counts_per_id_and_rejects_mixed():
    from multimodalsum_tpu.toolkit.steps import Postfixer

    p = Postfixer("gid")
    a1 = p(DataChunk(gid=["g1", "g1"], v=[1, 2]))
    b1 = p(DataChunk(gid=["g2"], v=[3]))
    a2 = p(DataChunk(gid=["g1", "g1", "g1"], v=[4, 5, 6]))
    assert list(a1["gid"]) == ["g1_1", "g1_1"]
    assert list(b1["gid"]) == ["g2_1"]
    assert list(a2["gid"]) == ["g1_2", "g1_2", "g1_2"]
    with pytest.raises(InvalidChunkError):
        p(DataChunk(gid=["g1", "g3"], v=[7, 8]))


def test_jax_pipeline_stages_numeric_fields(csv_dir):
    import jax

    from multimodalsum_tpu.toolkit.pipeline import JaxPipeline

    class AsFloat(Transformer):
        def __call__(self, chunk):
            chunk["score"] = chunk["score"].astype(np.float32)
            return chunk

    pipe = JaxPipeline(
        reader=CsvReader(chunk_size=4),
        steps=[AsFloat()],
        formatter=NumpyFormatter(),
    )
    batches = list(pipe.iter(os.path.join(csv_dir, "*.csv")))
    assert batches
    for b in batches:
        assert isinstance(b["score"], jax.Array)  # numeric -> on device
        assert isinstance(b["text"], np.ndarray)  # strings stay host-side
        assert b["text"].dtype.kind in ("U", "O")
