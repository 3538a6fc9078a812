"""Data-parallel (sharded-batch) generation over a device mesh.

The reference's eval is single-GPU (``src/test.py``); multi-device serving
there means one process per GPU. Here the same beam-search pipeline runs
SPMD: batch sharded over the ``data`` mesh axis, params replicated — the
sharded run must be token-identical to the single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodalsum_tpu.core.config import TINY_CONFIG, GenerationConfig
from multimodalsum_tpu.decode.engine import generate
from multimodalsum_tpu.models.bart import BartModel
from multimodalsum_tpu.parallel.mesh import (
    batch_sharding, dp_shardings, make_mesh, replicated,
)


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_CONFIG
    model = BartModel(cfg, multimodal=False)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    rng = np.random.default_rng(3)
    b, e, s = 8, 2, 10
    hiddens = jnp.asarray(rng.normal(size=(b, e, s, cfg.d_model)), jnp.float32)
    mask = jnp.ones((b, e, s), bool)
    gen = GenerationConfig(num_beams=4, max_length=12, min_length=3,
                           length_penalty=2.0, early_stopping=True)

    def pipeline(params, hiddens, mask):
        res = generate(model, params, [hiddens], [mask],
                       jnp.zeros((hiddens.shape[0], 1), jnp.float32), gen)
        return res.sequences, res.lengths

    return params, hiddens, mask, pipeline


def test_dp_beam_generate_matches_single_device(setup):
    params, hiddens, mask, pipeline = setup
    ref_seqs, ref_lens = jax.jit(pipeline)(params, hiddens, mask)

    mesh = make_mesh(data=len(jax.devices()), model=1)
    dp = jax.jit(pipeline,
                 in_shardings=dp_shardings(mesh, 3, 1),
                 out_shardings=batch_sharding(mesh))
    seqs, lens = dp(params, hiddens, mask)

    assert seqs.sharding.is_equivalent_to(batch_sharding(mesh), seqs.ndim)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(ref_seqs))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))


def test_dp_shardings_prefixes():
    mesh = make_mesh(data=len(jax.devices()), model=1)
    sh = dp_shardings(mesh, 4, 2)
    assert sh[0] == replicated(mesh) == sh[1]
    assert sh[2] == batch_sharding(mesh) == sh[3]


def test_tp_dp_beam_generate_matches_single_device(setup):
    """Tensor-parallel decode: params sharded with the Megatron rules over a
    (data=4, model=2) mesh, batch over data — still token-identical."""
    from multimodalsum_tpu.parallel.sharding import param_shardings

    params, hiddens, mask, pipeline = setup
    ref_seqs, ref_lens = jax.jit(pipeline)(params, hiddens, mask)

    n = len(jax.devices())
    if n % 2:
        pytest.skip("needs an even device count")
    mesh = make_mesh(data=n // 2, model=2)
    bs = NamedSharding(mesh, P("data"))
    tp = jax.jit(pipeline,
                 in_shardings=(param_shardings(params, mesh), bs, bs),
                 out_shardings=bs)
    seqs, lens = tp(params, hiddens, mask)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(ref_seqs))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))


def test_dp_ancestry_generate_matches_single_device(setup):
    """The reorder-free ancestry cache under a sharded batch (the
    ``--dp --cache_mode ancestry`` CLI combination)."""
    params, hiddens, mask, _ = setup
    gen = GenerationConfig(num_beams=4, max_length=12, min_length=3,
                           length_penalty=2.0, early_stopping=True)
    model = BartModel(TINY_CONFIG, multimodal=False)

    def pipeline(params, hiddens, mask):
        res = generate(model, params, [hiddens], [mask],
                       jnp.zeros((hiddens.shape[0], 1), jnp.float32), gen,
                       cache_mode="ancestry")
        return res.sequences, res.lengths

    ref_seqs, _ = jax.jit(pipeline)(params, hiddens, mask)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    dp = jax.jit(pipeline, in_shardings=dp_shardings(mesh, 3, 1),
                 out_shardings=batch_sharding(mesh))
    seqs, _ = dp(params, hiddens, mask)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(ref_seqs))
