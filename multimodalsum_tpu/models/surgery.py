"""Model surgery: token-embedding resize.

Equivalent of the reference's ``resize_token_embeddings`` +
``_resize_final_logits_bias`` (``modeling_multimodalsum.py:1122-1140``):
grow/shrink the shared embedding (new rows drawn N(0, init_std)) and the
final logits bias (new entries zero), keeping the weight tie intact — in
this framework the LM head reads the shared table directly, so resizing one
tree is the whole operation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_token_embeddings(params, new_num_tokens: int, *, init_std: float = 0.02,
                            rng=None):
    """Return a new param tree with ``shared.embedding`` and
    ``final_logits_bias`` resized to ``new_num_tokens``."""
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    old_emb = params["shared"]["embedding"]
    old_n, d = old_emb.shape
    if new_num_tokens == old_n:
        return params
    if new_num_tokens < old_n:
        new_emb = old_emb[:new_num_tokens]
    else:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        extra = init_std * jax.random.normal(
            rng, (new_num_tokens - old_n, d), old_emb.dtype)
        new_emb = jnp.concatenate([old_emb, extra], axis=0)
    params["shared"] = dict(params["shared"], embedding=new_emb)

    bias = params.get("final_logits_bias")
    if bias is not None:
        if new_num_tokens < old_n:
            params["final_logits_bias"] = bias[:new_num_tokens]
        else:
            params["final_logits_bias"] = jnp.concatenate(
                [bias, jnp.zeros(new_num_tokens - old_n, bias.dtype)])
    return params
