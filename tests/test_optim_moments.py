"""scale_by_adam_dtyped: bf16 Adam moments must track f32 moments.

The bf16-moment optimizer exists to halve AdamW state memory at bart-large
(VERDICT r4 #5); these tests pin (a) state dtype actually narrows, (b) the
loss trajectory stays within noise of the stock f32 path over enough steps
for the sticky-nu effect to show if it mattered, (c) the None path is the
stock optax composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodalsum_tpu.train.optim import (
    NO_DECAY_TEXT, make_optimizer, scale_by_adam_dtyped,
)


def _tiny_problem(seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(16, 8)).astype(np.float32)
    X = rng.normal(size=(64, 16)).astype(np.float32)
    Y = X @ W + 0.01 * rng.normal(size=(64, 8)).astype(np.float32)
    params = {"w": jnp.zeros((16, 8)), "bias": jnp.zeros((8,))}

    def loss_fn(p):
        pred = X @ p["w"] + p["bias"]
        return jnp.mean((pred - Y) ** 2)

    return params, jax.jit(jax.value_and_grad(loss_fn))


def _run(tx, params, vg, steps=60):
    state = tx.init(params)
    losses = []

    @jax.jit
    def step(params, state):
        loss, g = vg(params)
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(steps):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    return losses, state


def test_bf16_moments_track_f32_trajectory():
    params, vg = _tiny_problem()
    mk = lambda md: make_optimizer(
        params, learning_rate=3e-2, total_steps=200, warmup_ratio=0.0,
        no_decay=NO_DECAY_TEXT, moment_dtype=md)
    losses32, _ = _run(mk(None), params, vg)
    losses16, st16 = _run(mk(jnp.bfloat16), params, vg)
    assert losses32[-1] < losses32[0] / 10, "problem must actually train"
    # trajectories agree within bf16 rounding noise, far inside the band a
    # broken update rule (e.g. double bias correction, wrong EMA) would blow
    np.testing.assert_allclose(losses16, losses32, rtol=0.05, atol=1e-4)

    # moments actually stored narrow: the ScaleByAdamState hides inside
    # multi_transform's inner_states; flatten treating it as a leaf
    found = jax.tree.leaves(
        st16, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
    found = [s for s in found if isinstance(s, optax.ScaleByAdamState)]
    assert found, "no ScaleByAdamState in the optimizer state"
    for s in found:
        for leaf in jax.tree.leaves((s.mu, s.nu)):
            assert leaf.dtype == jnp.bfloat16


def test_dtyped_none_is_stock_scale_by_adam():
    params, vg = _tiny_problem(seed=1)
    a = scale_by_adam_dtyped(moment_dtype=None)
    b = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-6)
    _, g = vg(params)
    sa, sb = a.init(params), b.init(params)
    ua, sa = a.update(g, sa, params)
    ub, sb = b.update(g, sb, params)
    for la, lb in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_dtyped_update_matches_f32_adam_first_step():
    """Step 1 from zero moments is exactly representable territory: the
    dtyped core must reproduce stock scale_by_adam to bf16 rounding."""
    params, vg = _tiny_problem(seed=2)
    _, g = vg(params)
    a = scale_by_adam_dtyped(moment_dtype=jnp.bfloat16)
    b = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-6)
    ua, _ = a.update(g, a.init(params), params)
    ub, _ = b.update(g, b.init(params), params)
    for la, lb in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-2, atol=1e-6)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
