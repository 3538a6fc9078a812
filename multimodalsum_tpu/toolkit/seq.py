"""Recurrent seq2seq toolkit: GRU encoder/decoder, attention, pointer-generator.

Equivalent of the reference's ``mltoolkit/mlmo`` modelling toolkit (GRU
encoder, ``GruPointerDecoder``, ``PointerGenNetwork``, ``Attention``,
ONMT-style beam search — dead code on the reference's main path but part of
its component inventory and test suite, SURVEY §2.6). Re-designed as Flax
modules + a generic :class:`Beamer` facade over the framework's on-device
beam search, so any scripted step function — not just BART — can decode.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodalsum_tpu.core.config import GenerationConfig
from multimodalsum_tpu.decode.beam_search import BeamResult, beam_search


class GruEncoder(nn.Module):
    """Unidirectional GRU over embedded inputs.

    Returns (outputs [b, t, h], final_state [b, h]); padded steps carry the
    last valid state forward.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        cell = nn.GRUCell(features=self.hidden_size)
        b = x.shape[0]
        carry0 = cell.initialize_carry(jax.random.PRNGKey(0), (b, x.shape[-1]))

        def step(cell, carry, inputs):
            xt, mt = inputs
            new_carry, out = cell(carry, xt)
            if mt is not None:
                keep = mt[:, None]
                new_carry = jnp.where(keep, new_carry, carry)
                out = jnp.where(keep, out, jnp.zeros_like(out))
            return new_carry, out

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        m = None if mask is None else mask.astype(bool)
        carry, outputs = scan(cell, carry0, (x, None if m is None else m))
        return outputs, carry


class BahdanauAttention(nn.Module):
    """Additive attention (reference mlmo ``Attention``)."""

    hidden_size: int

    @nn.compact
    def __call__(self, query: jnp.ndarray, keys: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None):
        """query [b, h], keys [b, s, h] -> (context [b, h], weights [b, s])."""
        q = nn.Dense(self.hidden_size, name="query_proj")(query)[:, None, :]
        k = nn.Dense(self.hidden_size, name="key_proj")(keys)
        scores = nn.Dense(1, use_bias=False, name="score")(jnp.tanh(q + k))[..., 0]
        if mask is not None:
            scores = jnp.where(mask.astype(bool), scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bs,bsh->bh", weights, keys)
        return context, weights


class GruPointerDecoder(nn.Module):
    """GRU decoder with attention and a copy gate (pointer-generator).

    One step: (prev embedding, state, encoder outputs/ids/mask) →
    (mixture distribution over the vocab [b, V], new state). The final
    distribution is ``p_gen * softmax(W h) + (1-p_gen) * copy``, where the
    copy distribution scatters the attention weights onto the source token
    ids (reference mlmo ``PointerGenNetwork`` semantics).
    """

    hidden_size: int
    vocab_size: int

    @nn.compact
    def __call__(self, prev_emb: jnp.ndarray, state: jnp.ndarray,
                 enc_out: jnp.ndarray, enc_ids: jnp.ndarray,
                 enc_mask: Optional[jnp.ndarray] = None):
        context, attn = BahdanauAttention(self.hidden_size, name="attention")(
            state, enc_out, enc_mask)
        new_state, _ = nn.GRUCell(features=self.hidden_size, name="cell")(
            state, jnp.concatenate([prev_emb, context], axis=-1))
        features = jnp.concatenate([new_state, context], axis=-1)
        gen_logits = nn.Dense(self.vocab_size, name="out_proj")(features)
        gen_dist = jax.nn.softmax(gen_logits, axis=-1)
        p_gen = nn.sigmoid(nn.Dense(1, name="copy_gate")(features))  # [b, 1]

        b = attn.shape[0]
        copy_dist = jnp.zeros((b, self.vocab_size), attn.dtype)
        copy_dist = copy_dist.at[jnp.arange(b)[:, None], enc_ids].add(attn)
        mixture = p_gen * gen_dist + (1.0 - p_gen) * copy_dist
        return mixture, new_state, attn


class Beamer:
    """Generic beam-search facade over arbitrary step functions.

    The reference's mlmo ``Beamer`` decodes any model exposing a scripted
    decoding function; here the same contract binds to the framework's
    on-device ``lax.while_loop`` beam search. ``step_fn(tokens [rows, 1],
    index, cache) -> (logits [rows, vocab], cache)`` — cache is any pytree
    with leading dim ``rows`` (reordered across beams automatically).
    """

    def __init__(self, step_fn: Callable, vocab_size: int, *,
                 start_id: int, end_id: int, pad_id: int,
                 bos_id: Optional[int] = None):
        self.step_fn = step_fn
        self.vocab_size = vocab_size
        self.start_id = start_id
        self.end_id = end_id
        self.pad_id = pad_id
        self.bos_id = bos_id if bos_id is not None else start_id

    def decode(self, init_cache, batch_size: int, *, beam_size: int = 4,
               max_length: int = 20, length_penalty: float = 1.0,
               min_length: int = 0, early_stopping: bool = False,
               no_repeat_ngram_size: int = 0) -> BeamResult:
        gen = GenerationConfig(
            num_beams=beam_size, max_length=max_length, min_length=min_length,
            length_penalty=length_penalty, early_stopping=early_stopping,
            no_repeat_ngram_size=no_repeat_ngram_size,
        )
        return beam_search(
            self.step_fn, init_cache, batch_size,
            vocab_size=self.vocab_size, gen=gen,
            decoder_start_token_id=self.start_id, bos_token_id=self.bos_id,
            pad_token_id=self.pad_id, eos_token_id=self.end_id,
            force_bos_eos=False,
        )


class Ffnn(nn.Module):
    """Feed-forward scorer: a Dense stack with a nonlinearity between hidden
    layers and raw (unbounded) scores out (reference ``mlmo/layers/ffnn.py:6``).

    ``hidden_dims`` may be empty (a single affine map, the reference's
    ``hidden_dim=None``)."""

    output_dim: int
    hidden_dims: Tuple[int, ...] = ()
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for h in self.hidden_dims:
            x = self.activation(nn.Dense(h)(x))
        return nn.Dense(self.output_dim)(x)


class MuSigmaFfnn(nn.Module):
    """Gaussian-head FFNN: one network emits ``2*output_dim`` values split
    into ``mu`` and ``sigma = exp(log_sigma)`` (non-negative by construction)
    — reference ``mlmo/layers/mu_sigma_ffnn.py:6``."""

    output_dim: int
    hidden_dims: Tuple[int, ...] = ()
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out = Ffnn(2 * self.output_dim, self.hidden_dims, self.activation)(x)
        mu, log_sigma = jnp.split(out, 2, axis=-1)
        return mu, jnp.exp(log_sigma)


def out_embds(x: jnp.ndarray, embedding: jnp.ndarray,
              vocab_size: Optional[int] = None) -> jnp.ndarray:
    """Tied output projection: logits against (a prefix of) an existing
    embedding table (reference ``mlmo/layers/out_embds.py:5``). As a function
    rather than a module because in Flax weight sharing is explicit — the
    caller passes the embedding array it already owns."""
    table = embedding if vocab_size is None else embedding[:vocab_size]
    return x @ table.T


def kl_cyc_annealing(step, total_steps: int, m: int = 4, r: float = 0.5,
                     max_val: float = 1.0):
    """Cyclical KL-annealing scale (reference
    ``mlmo/utils/tools/annealing/kl_cyc_annealing.py:1``, after "Cyclical
    Annealing Schedule", Fu et al. 2019). Functional — a pure map from the
    1-based batch index to the scale, usable inside jit (the reference's
    version is a stateful counter object; optax-style schedules are the JAX
    idiom). ``step == 0`` returns 0, matching the reference's pre-increment
    call. Degenerate configs stay finite where the reference divides by
    zero: the cycle period is clamped to >= 1 step (``total_steps < m``)
    and ``r == 0`` means an instant ramp (0 at cycle start, 1 after)."""
    period = jnp.maximum(jnp.round(total_steps / m), 1.0)
    tau = ((step - 1) % period) / jnp.maximum(total_steps / m, 1.0)
    val = jnp.where(tau <= r, tau / jnp.maximum(r, 1e-9), 1.0)
    return jnp.where(step == 0, 0.0, max_val * jnp.minimum(val, 1.0))


def kl_mon_annealing(step, ann_batches: int, start: float = 0.0,
                     end: float = 1.0):
    """Monotonic KL-annealing scale (reference ``kl_mon_annealing.py:1``):
    linear ``start → end`` over ``ann_batches`` steps, clamped at ``end``;
    ``ann_batches in (0, None)`` disables annealing (scale 1)."""
    if not ann_batches:
        return jnp.asarray(1.0)
    prop = jnp.asarray(step, jnp.float32) / ann_batches
    return jnp.minimum(end, start + (end - start) * prop)
