"""Profile the flagship decode pipeline on the current device.

Dumps a JAX profiler trace (TensorBoard/xprof-loadable) of one encoder pass +
one full beam-search decode, plus wall-clock timings synchronized via host
transfer (block_until_ready does not block on the axon backend).

Usage:  python scripts/profile_decode.py [--batch 8] [--trace /tmp/trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--trace", type=str, default="/tmp/mms_trace")
    p.add_argument("--pallas", action="store_true")
    args = p.parse_args()

    if args.pallas:
        from multimodalsum_tpu.ops.attention import set_entity_attention_impl

        set_entity_attention_impl("pallas")

    from multimodalsum_tpu.core.config import BartConfig, GenerationConfig
    from multimodalsum_tpu.core.observability import trace
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.models.bart import BartModel

    cfg = BartConfig(dropout=0.0)
    gen = GenerationConfig(num_beams=5, max_length=142, min_length=56,
                           length_penalty=2.0, early_stopping=True,
                           no_repeat_ngram_size=3)
    bart = BartModel(cfg, multimodal=False, dtype=jnp.bfloat16)
    params = jax.jit(lambda: bart.init(jax.random.PRNGKey(0),
                                       method=BartModel.init_all)["params"])()

    b, e, s = args.batch, 8, 160
    rng = np.random.default_rng(0)
    hiddens = rng.normal(size=(b, e, s, cfg.d_model)).astype(np.float32)
    mask = np.ones((b, e, s), bool)

    @jax.jit
    def decode(params, hiddens, mask):
        res = generate(bart, params, [hiddens.astype(jnp.bfloat16)], [mask],
                       jnp.zeros((b, 1), jnp.float32), gen)
        return res.sequences, res.lengths

    t0 = time.time()
    seqs, lengths = decode(params, hiddens, mask)
    lengths = np.asarray(lengths)
    print(f"compile+run {time.time()-t0:.1f}s; lengths {lengths[:,0].tolist()[:4]}...")

    times = []
    for _ in range(3):
        t0 = time.time()
        _, lengths = decode(params, hiddens, mask)
        np.asarray(lengths)
        times.append(time.time() - t0)
    steps = int(lengths.max()) - 1
    dt = min(times)
    print(f"decode: {dt*1000:.0f} ms/batch of {b} ({dt/steps*1e3:.2f} ms/step, "
          f"{b/dt:.2f} summaries/s)")

    with trace(args.trace):
        _, lengths = decode(params, hiddens, mask)
        np.asarray(lengths)
    print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
