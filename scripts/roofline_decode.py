"""Per-op HBM-traffic roofline for ONE exact beam-decode step (VERDICT r2 #3).

Breaks the b44/beam5 bart-large decode step (the bench headline's hot loop,
reference loop being beaten: ``modeling_multimodalsum.py:2921+``) into its
bandwidth components, measures each in isolation on the current device, and
prints a table of bytes moved / measured time / achieved GB/s against the
speed-of-light stream of the same bytes:

  stream_kv     pure read of all cross-KV bytes (jnp.sum) — the SOL anchor
  cross_attn    the 12-layer x 3-modality entity cross-attention (real masks)
  self_attn     decoder self-attention over the static 142-position cache
  matmuls       qkvo/ffn/lm-head weight-bound GEMMs at [rows, d]
  logits_chain  postprocess_scores + top_k at [b, K*V]
  full_step     the real jitted decode step via BartModel.decode_step

Each component is timed as a ``lax.fori_loop`` of ITERS chained iterations
inside one jit (single dispatch — per-call host RTT would swamp ~ms ops),
synchronized by a host read.

Usage:  python scripts/roofline_decode.py [--batch 44] [--beams 5] [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

E, S_TEXT, S_TAB, N_IMG, S_IMG = 8, 160, 47, 10, 196


def _sync(out):
    """Host sync: axon block_until_ready is unreliable; fetch a tiny slice
    (data dependency forces the whole enqueued graph to finish)."""
    leaf = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")][0]
    np.asarray(leaf.reshape(-1)[:1])


def timed(fn, args, iters, tag):
    """Compile, run once, then time ``iters`` chained reps inside the jit."""
    _sync(fn(*args))  # compile + drain the device queue before timing
    t0 = time.time()
    _sync(fn(*args))
    dt = (time.time() - t0) / iters
    print(f"# {tag}: {dt*1e3:.3f} ms/iter", flush=True)
    return dt


def nbytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "size"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=44)
    p.add_argument("--beams", type=int, default=5)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    b, K, iters = args.batch, args.beams, args.iters
    rows = b * K

    from multimodalsum_tpu.core.config import BartConfig
    from multimodalsum_tpu.models.bart import BartModel, init_self_attn_cache

    cfg = BartConfig(dropout=0.0)
    model = BartModel(cfg, multimodal=True, dtype=jnp.bfloat16)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), method=BartModel.init_all)["params"])()
    d, L, V = cfg.d_model, cfg.max_position_embeddings, cfg.vocab_size
    L = 142
    n, h = cfg.decoder_attention_heads, d // cfg.decoder_attention_heads

    rng = np.random.default_rng(0)
    hiddens = [
        jnp.asarray(rng.normal(size=(b, E, S_TEXT, d)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(b, 1, S_TAB, d)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(b, N_IMG, S_IMG, d)), jnp.bfloat16),
    ]
    masks = [jnp.ones((b, E, S_TEXT), bool), jnp.ones((b, 1, S_TAB), bool),
             jnp.ones((b, N_IMG, S_IMG), bool)]
    cross_kv = jax.jit(lambda hs: model.apply(
        {"params": params}, list(hs), method=BartModel.init_decode))(hiddens)
    ckv_bytes = nbytes(cross_kv)

    cache = init_self_attn_cache(cfg, rows, L, dtype=jnp.bfloat16)
    cache_bytes = nbytes(cache)
    rating = jnp.zeros((rows, 1), jnp.float32)
    tokens = jnp.full((rows, 1), 2, jnp.int32)
    # scalar mid-decode position — the offline headline path's while_loop
    # counter (vector [rows] indices are the serving path)
    pos = jnp.int32(71)

    results = {}
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}; b={b} beams={K} rows={rows}; cross-KV "
          f"{ckv_bytes/1e9:.2f} GB, self-cache {cache_bytes/1e9:.2f} GB",
          flush=True)

    def loop(body, init):
        def f(x):
            return jax.lax.fori_loop(0, iters, lambda i, c: body(c, i), init(x))
        return jax.jit(f)

    # 1) speed-of-light: stream every cross-KV byte once per iteration.
    # The carry is folded INTO each leaf before the reduction so the sums
    # are loop-variant — XLA's while-loop LICM would otherwise hoist a
    # loop-invariant `sum(x)` out of the fori_loop and measure nothing.
    leaves = jax.tree.leaves(cross_kv)

    def stream_body(c, i):
        acc = c
        for x in leaves:
            acc = acc + jnp.sum((x + acc.astype(x.dtype)).astype(jnp.float32))
        return acc * 1e-30

    dt = timed(loop(stream_body, lambda x: x), (jnp.float32(0.0),), iters,
               "stream_kv")
    results["stream_kv"] = dict(ms=dt * 1e3, gb=ckv_bytes / 1e9,
                                gbps=ckv_bytes / dt / 1e9)

    # 2) cross-attention: 12 layers x 3 modalities at the real shapes
    from multimodalsum_tpu.ops.attention import entity_cross_attention

    q0 = jnp.asarray(rng.normal(size=(b, K, n, h)), jnp.bfloat16)

    def cross_body(c, i):
        q = c
        for lkv in cross_kv:  # per layer: 3 modality bundles
            outs = [entity_cross_attention(q, kk, vv, m)
                    for (kk, vv), m in zip(lkv, masks)]
            q = outs[0] + outs[1] + outs[2]
        return q * 0.5

    dt = timed(loop(cross_body, lambda x: x), (q0,), iters, "cross_attn")
    results["cross_attn"] = dict(ms=dt * 1e3, gb=ckv_bytes / 1e9,
                                 gbps=ckv_bytes / dt / 1e9)

    # 3) self-attention over the full static cache (every step reads it all)
    from multimodalsum_tpu.ops.attention import cached_self_attention_step

    qs0 = jnp.asarray(rng.normal(size=(rows, 1, n, h)), jnp.bfloat16)

    def self_body(c, i):
        q = c
        for kc, vc in cache:
            q = cached_self_attention_step(q, kc, vc, pos)
        return q * 0.5

    dt = timed(loop(self_body, lambda x: x), (qs0,), iters, "self_attn")
    results["self_attn"] = dict(ms=dt * 1e3, gb=cache_bytes / 1e9,
                                gbps=cache_bytes / dt / 1e9)

    # 4) weight-bound GEMMs: qkvo+ffn over 12 layers + lm head at [rows, d]
    Wd = jnp.asarray(rng.normal(size=(d, d)), jnp.bfloat16)
    Wf1 = jnp.asarray(rng.normal(size=(d, cfg.decoder_ffn_dim)), jnp.bfloat16)
    Wf2 = jnp.asarray(rng.normal(size=(cfg.decoder_ffn_dim, d)), jnp.bfloat16)
    Whead = jnp.asarray(rng.normal(size=(d, V)), jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(rows, d)), jnp.bfloat16)
    w_bytes = (12 * (6 * d * d + 2 * d * cfg.decoder_ffn_dim) + d * V) * 2

    def mm_body(c, i):
        x = c
        for _ in range(12):
            for _ in range(6):  # self qkvo + cross q,o
                x = x @ Wd
            y = x @ Wf1
            x = y @ Wf2
        logits = x @ Whead
        return x + logits[:, :d] * 1e-6

    dt = timed(loop(mm_body, lambda x: x), (x0,), iters, "matmuls")
    results["matmuls"] = dict(ms=dt * 1e3, gb=w_bytes / 1e9,
                              gbps=w_bytes / dt / 1e9)

    # 5) logits chain: beam postprocess + top_k at the real shapes
    from multimodalsum_tpu.decode.logits import postprocess_scores

    scores0 = jnp.asarray(rng.normal(size=(rows, V)), jnp.float32)
    toks = jnp.full((rows, L), 2, jnp.int32)

    def chain_body(c, i):
        s = jax.nn.log_softmax(c, axis=-1)
        s = postprocess_scores(s, toks, jnp.int32(71),
                               min_length=56, eos_token_id=cfg.eos_token_id,
                               no_repeat_ngram_size=3)
        flat = s.reshape(b, K * V)
        top, _ = jax.lax.top_k(flat, 2 * K)
        return c * 0.999 + top[:, :1].repeat(K, 0).astype(c.dtype) * 1e-9

    dt = timed(loop(chain_body, lambda x: x), (scores0,), iters,
               "logits_chain")
    results["logits_chain"] = dict(ms=dt * 1e3)

    # 6) the real full decode step (decoder + lm head; logits chain excluded)
    def full_body(c, i):
        x, cache_c = c
        logits, new_cache = model.apply(
            {"params": params}, x, pos, cache_c, cross_kv, list(masks),
            rating, method=BartModel.decode_step)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        return nxt, new_cache

    dt = timed(loop(full_body, lambda x: x), ((tokens, cache),), iters,
               "full_step")
    step_bytes = ckv_bytes + cache_bytes + w_bytes
    results["full_step"] = dict(ms=dt * 1e3, gb=step_bytes / 1e9,
                                gbps=step_bytes / dt / 1e9)

    print("#")
    print(f"# {'component':<14} {'ms':>8} {'GB moved':>9} {'GB/s':>8}")
    for k, v in results.items():
        print(f"# {k:<14} {v['ms']:>8.3f} {v.get('gb', 0):>9.2f} "
              f"{v.get('gbps', 0):>8.0f}")
    print(json.dumps(dict(device=dev, batch=b, beams=K, **results)))


if __name__ == "__main__":
    main()
