"""A/B the fused Pallas entity attention vs XLA at TRAINING shapes on the
real chip (VERDICT r1 #7): stage-3 geometry — queries [b, 128, 16, 64] vs
8 entities x 128 source positions — forward-only and forward+backward.

At these shapes the XLA path materialises the [b, e, n, t, s] probability
tensor in HBM between fusions (b=8: ~134 MB bf16 each way per layer); the
fused kernel keeps everything for one (batch, head) cell in VMEM and its
custom VJP recomputes the probabilities flash-style.

Timings synchronize via host transfers (block_until_ready is a no-op on the
axon backend). Usage: python scripts/pallas_train_ab.py [b t e s]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsum_tpu.ops.attention import entity_cross_attention
from multimodalsum_tpu.ops.pallas_attention import entity_cross_attention_fused


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def timeit(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def ab(fn_a, fn_b, args, iters=20, rounds=5):
    """Interleaved A/B, min over rounds — cancels slow drift on the shared
    dev chip and rejects one-off stalls."""
    ta = tb = float("inf")
    for _ in range(rounds):
        ta = min(ta, timeit(fn_a, args, iters=iters, warmup=1))
        tb = min(tb, timeit(fn_b, args, iters=iters, warmup=1))
    return ta, tb


def main():
    b, t, e, s = (int(x) for x in (sys.argv[1:] + ["8", "128", "8", "128"])[:4])
    n, h = 16, 64  # bart-large heads
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    q = jax.device_put(jnp.asarray(rng.normal(size=(b, t, n, h)), dtype))
    k = jax.device_put(jnp.asarray(rng.normal(size=(b, e, s, n, h)), dtype))
    v = jax.device_put(jnp.asarray(rng.normal(size=(b, e, s, n, h)), dtype))
    mask = np.ones((b, e, s), bool)
    mask[:, -1, s // 2:] = False
    mask = jax.device_put(jnp.asarray(mask))

    xla_f = jax.jit(lambda q, k, v: entity_cross_attention(q, k, v, mask))
    pal_f = jax.jit(lambda q, k, v: entity_cross_attention_fused(q, k, v, mask))

    # numerical agreement on chip first
    d = float(jnp.abs(xla_f(q, k, v).astype(jnp.float32) -
                      pal_f(q, k, v).astype(jnp.float32)).max())
    print(f"shape b={b} t={t} e={e} s={s} n={n} h={h} | fwd maxdiff {d:.2e}")

    tx, tp = ab(xla_f, pal_f, (q, k, v))
    print(f"fwd : xla {tx*1e3:8.3f} ms | pallas {tp*1e3:8.3f} ms | "
          f"speedup {tx/tp:5.2f}x")

    def loss_x(q, k, v):
        return jnp.sum(entity_cross_attention(q, k, v, mask).astype(jnp.float32) ** 2)

    def loss_p(q, k, v):
        return jnp.sum(entity_cross_attention_fused(q, k, v, mask).astype(jnp.float32) ** 2)

    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
    ga, gb = gx(q, k, v), gp(q, k, v)
    gd = max(float(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)).max())
             for a, bb in zip(ga, gb))
    print(f"grad maxdiff {gd:.2e}")

    txg, tpg = ab(gx, gp, (q, k, v), iters=10)
    print(f"fwd+bwd: xla {txg*1e3:8.3f} ms | pallas {tpg*1e3:8.3f} ms | "
          f"speedup {txg/tpg:5.2f}x")


if __name__ == "__main__":
    main()
