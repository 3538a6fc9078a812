"""Per-op HBM-traffic roofline for ONE exact beam-decode step (VERDICT r2 #3).

Breaks the b44/beam5 bart-large decode step (the bench headline's hot loop,
reference loop being beaten: ``modeling_multimodalsum.py:2921+``) into its
bandwidth components, measures each in isolation on the current device, and
prints a table of bytes moved / measured time / achieved GB/s against the
speed-of-light stream of the same bytes:

  stream_kv     pure read of all cross-KV bytes (jnp.sum) — the SOL anchor
  self_attn     decoder self-attention over the static 142-position cache
  matmuls       qkvo/ffn/lm-head weight-bound GEMMs at [rows, d]
  logits_chain  postprocess_scores + top_k at [b, K*V]
  cross_attn    the 12-layer x 3-modality entity cross-attention (real masks)
  full_step     the real jitted decode step via BartModel.decode_step

Each component is timed as a ``lax.fori_loop`` of ITERS chained iterations
inside one jit (single dispatch — per-call host RTT would swamp ~ms ops),
synchronized by a host read. All arrays ride as jit ARGUMENTS — closing
over them captures multi-GB constants into the HLO (observed: the 7.11 GB
cross-KV serialized through the device tunnel at lowering).

``--section`` runs ONE component in a fresh process: the full working set
(params + cross-KV + self-cache + section temporaries) exceeds the 16 GB
HBM when every section shares a process (observed ResourceExhausted on
cross_attn). ``--section all`` (default) re-execs each section as a
subprocess and merges the JSON; the stream/cross sections synthesize
KV-shaped data on device instead of paying model init + real projections.

Usage:  python scripts/roofline_decode.py [--batch 44] [--beams 5]
        [--iters 30] [--section all|stream|self|mm|chain|cross|full]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache (same dir as bench.py)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "_work", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

E, S_TEXT, S_TAB, N_IMG, S_IMG = 8, 160, 47, 10, 196
MOD_SHAPES = ((E, S_TEXT), (1, S_TAB), (N_IMG, S_IMG))


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


def loop(body, iters):
    """jit a fori_loop of ``iters`` chained body calls; arrays as args."""
    def f(init, *arrays):
        return jax.lax.fori_loop(
            0, iters, lambda i, c: body(c, i, *arrays), init)
    return jax.jit(f)


def synth_cross_kv(b, n, h):
    """KV-shaped random data, built ON DEVICE in one jit (layer x modality
    nested (k, v) at [b, e, s, n, h] bf16 — models/bart.py
    precompute_cross_kv) — same bytes as the real projections without
    paying model init."""
    def make(key):
        out = []
        for _ in range(12):
            mods = []
            for e_, s_ in MOD_SHAPES:
                key, k1, k2 = jax.random.split(key, 3)
                mods.append(
                    (jax.random.normal(k1, (b, e_, s_, n, h), jnp.bfloat16),
                     jax.random.normal(k2, (b, e_, s_, n, h), jnp.bfloat16)))
            out.append(tuple(mods))
        return tuple(out)

    return jax.jit(make)(jax.random.PRNGKey(0))


def run_section(section, b, K, iters):
    from multimodalsum_tpu.core.config import BartConfig

    cfg = BartConfig(dropout=0.0)
    d, V = cfg.d_model, cfg.vocab_size
    L = 142
    n, h = cfg.decoder_attention_heads, d // cfg.decoder_attention_heads
    rows = b * K
    rng = np.random.default_rng(0)
    masks = [jnp.ones((b, e_, s_), bool) for e_, s_ in MOD_SHAPES]
    ckv_bytes = sum(2 * b * e_ * s_ * n * h * 2 for e_, s_ in MOD_SHAPES) * 12

    if section == "stream":
        # speed-of-light: stream every cross-KV byte once per iteration.
        # The carry folds INTO each leaf before the reduction so the sums
        # are loop-variant — XLA's while-loop LICM would otherwise hoist a
        # loop-invariant `sum(x)` out of the fori_loop and measure nothing.
        leaves = tuple(jax.tree.leaves(synth_cross_kv(b, n, h)))

        def stream_body(c, i, *xs):
            acc = c
            for x in xs:
                acc = acc + jnp.sum((x + acc.astype(x.dtype))
                                    .astype(jnp.float32))
            return acc * 1e-30

        dt = timed(loop(stream_body, iters), (jnp.float32(0.0), *leaves),
                   iters, "stream_kv")
        return {"stream_kv": dict(ms=dt * 1e3, gb=ckv_bytes / 1e9,
                                  gbps=ckv_bytes / dt / 1e9)}

    if section == "self":
        # self-attention over the full static cache (read whole every step)
        from multimodalsum_tpu.models.bart import init_self_attn_cache
        from multimodalsum_tpu.ops.attention import cached_self_attention_step

        cache = init_self_attn_cache(cfg, rows, L, dtype=jnp.bfloat16)
        cache_bytes = nbytes(cache)
        qs0 = jnp.asarray(rng.normal(size=(rows, 1, n, h)), jnp.bfloat16)
        pos = jnp.int32(71)

        def self_body(c, i, cch, p):
            q = c
            for kc, vc in cch:
                q = cached_self_attention_step(q, kc, vc, p)
            return q * 0.5

        dt = timed(loop(self_body, iters), (qs0, cache, pos), iters,
                   "self_attn")
        return {"self_attn": dict(ms=dt * 1e3, gb=cache_bytes / 1e9,
                                  gbps=cache_bytes / dt / 1e9)}

    if section == "mm":
        # weight-bound GEMMs: qkvo+ffn over 12 layers + lm head at [rows, d]
        Wd = jnp.asarray(rng.normal(size=(d, d)), jnp.bfloat16)
        Wf1 = jnp.asarray(rng.normal(size=(d, cfg.decoder_ffn_dim)),
                          jnp.bfloat16)
        Wf2 = jnp.asarray(rng.normal(size=(cfg.decoder_ffn_dim, d)),
                          jnp.bfloat16)
        Whead = jnp.asarray(rng.normal(size=(d, V)), jnp.bfloat16)
        x0 = jnp.asarray(rng.normal(size=(rows, d)), jnp.bfloat16)
        w_bytes = (12 * (6 * d * d + 2 * d * cfg.decoder_ffn_dim) + d * V) * 2

        def mm_body(c, i, wd, wf1, wf2, wh):
            x = c
            for _ in range(12):
                for _ in range(6):  # self qkvo + cross q,o
                    x = x @ wd
                y = x @ wf1
                x = y @ wf2
            logits = x @ wh
            return x + logits[:, :d] * 1e-6

        dt = timed(loop(mm_body, iters), (x0, Wd, Wf1, Wf2, Whead), iters,
                   "matmuls")
        return {"matmuls": dict(ms=dt * 1e3, gb=w_bytes / 1e9,
                                gbps=w_bytes / dt / 1e9)}

    if section == "chain":
        # logits chain: beam postprocess + top_k at the real shapes
        from multimodalsum_tpu.decode.logits import postprocess_scores

        scores0 = jnp.asarray(rng.normal(size=(rows, V)), jnp.float32)
        toks = jnp.full((rows, L), 2, jnp.int32)
        pos = jnp.int32(71)

        def chain_body(c, i, tk, p):
            s = jax.nn.log_softmax(c, axis=-1)
            s = postprocess_scores(s, tk, p, min_length=56,
                                   eos_token_id=cfg.eos_token_id,
                                   no_repeat_ngram_size=3)
            flat = s.reshape(b, K * V)
            top, _ = jax.lax.top_k(flat, 2 * K)
            return c * 0.999 + top[:, :1].repeat(K, 0).astype(c.dtype) * 1e-9

        dt = timed(loop(chain_body, iters), (scores0, toks, pos), iters,
                   "logits_chain")
        return {"logits_chain": dict(ms=dt * 1e3)}

    if section == "cross":
        # cross-attention: 12 layers x 3 modalities at the real shapes
        from multimodalsum_tpu.ops.attention import entity_cross_attention

        cross_kv = synth_cross_kv(b, n, h)
        q0 = jnp.asarray(rng.normal(size=(b, K, n, h)), jnp.bfloat16)

        def cross_body(c, i, ckv, mks):
            q = c
            for lkv in ckv:  # per layer: 3 modality bundles
                outs = [entity_cross_attention(q, kk, vv, m)
                        for (kk, vv), m in zip(lkv, mks)]
                q = outs[0] + outs[1] + outs[2]
            return q * 0.5

        dt = timed(loop(cross_body, iters), (q0, cross_kv, tuple(masks)),
                   iters, "cross_attn")
        return {"cross_attn": dict(ms=dt * 1e3, gb=ckv_bytes / 1e9,
                                   gbps=ckv_bytes / dt / 1e9)}

    if section == "full":
        # per-step cost of the REAL jitted engine — the exact code path the
        # bench headline times (bench.bench_batch: 3 encoders + 142-step
        # beam while_loop in ONE jit) minus a separately-timed encoder-only
        # jit, divided by the decode step count. A synthetic fori_loop over
        # BartModel.decode_step with the cross-KV as loop arguments OOMs:
        # XLA inserts padded relayout copies (110 -> 176 MB per KV leaf,
        # T(8,128)(2,1) tiling) for every leaf, while the production
        # while_loop keeps the KV loop-invariant in its producer layout.
        import bench as benchmod
        from multimodalsum_tpu.models.multimodal import (MultimodalSum,
                                                         yelp_dummy_table)

        inputs = benchmod.make_inputs(cfg)
        full = benchmod.bench_batch(inputs, b, cache_mode="ancestry")
        dt_full = full["dt"]

        st = benchmod.shared_model_state()
        model = st["model"]
        reviews, reviews_mask, img, img_mask = (x[:b] for x in inputs)
        field, values = yelp_dummy_table(b)

        def encode_only(params, batch_stats, reviews, reviews_mask,
                        field, values, img, img_mask):
            vs = {"params": params, "batch_stats": batch_stats}
            text_h = model.apply(vs, reviews, reviews_mask,
                                 method=MultimodalSum.encode_text)
            table_h, _ = model.apply(vs, field, values,
                                     method=MultimodalSum.encode_table)
            img_h, _ = model.apply(vs, img, img_mask,
                                   method=MultimodalSum.encode_img)
            return (jnp.sum(text_h.astype(jnp.float32))
                    + jnp.sum(table_h.astype(jnp.float32))
                    + jnp.sum(img_h.astype(jnp.float32)))

        enc = jax.jit(encode_only)
        args = jax.device_put((st["params"], st["batch_stats"], reviews,
                               reviews_mask, field, values, img, img_mask))
        _sync(args[2])
        _sync(enc(*args))  # compile
        enc_times = []
        for _ in range(3):
            t0 = time.time()
            _sync(enc(*args))
            enc_times.append(time.time() - t0)
        dt_enc = float(np.median(enc_times))
        steps = 141  # BOS prompt, positions 1..141 decoded in the loop
        dt = (dt_full - dt_enc) / steps
        print(f"# full_step: {dt*1e3:.3f} ms/step "
              f"(pipeline {dt_full:.3f}s - encoders {dt_enc:.3f}s, "
              f"{steps} steps)", flush=True)
        cache_bytes = 12 * 2 * rows * L * n * h * 2
        w_bytes = (12 * (6 * d * d + 2 * d * cfg.decoder_ffn_dim) + d * V) * 2
        step_bytes = ckv_bytes + cache_bytes + w_bytes
        return {"full_step": dict(ms=dt * 1e3, gb=step_bytes / 1e9,
                                  gbps=step_bytes / dt / 1e9,
                                  pipeline_s=dt_full, encoders_s=dt_enc)}

    raise SystemExit(f"unknown section {section!r}")


SECTIONS = ("stream", "self", "mm", "chain", "cross", "full")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=44)
    p.add_argument("--beams", type=int, default=5)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--section", default="all", choices=("all",) + SECTIONS)
    args = p.parse_args()

    if args.section != "all":
        res = run_section(args.section, args.batch, args.beams, args.iters)
        print(json.dumps(res))
        return

    # orchestrate: one subprocess per section — fresh HBM each (params +
    # cross-KV + cache + section temps together exceed the 16 GB chip)
    results = {}
    for sec in SECTIONS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--batch", str(args.batch), "--beams", str(args.beams),
             "--iters", str(args.iters), "--section", sec],
            capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("#"):
                print(line, flush=True)
        tail = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode or not tail:
            print(f"# section {sec} FAILED (rc={out.returncode}):", flush=True)
            print("\n".join(out.stderr.splitlines()[-5:]), flush=True)
            continue
        results.update(json.loads(tail[-1]))

    dev = jax.devices()[0].device_kind
    print("#")
    print(f"# {'component':<14} {'ms':>8} {'GB moved':>9} {'GB/s':>8}")
    for k, v in results.items():
        print(f"# {k:<14} {v['ms']:>8.3f} {v.get('gb', 0):>9.2f} "
              f"{v.get('gbps', 0):>8.0f}")
    print(json.dumps(dict(device=dev, batch=args.batch, beams=args.beams,
                          **results)))


if __name__ == "__main__":
    main()
