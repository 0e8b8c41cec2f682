"""Fused AdamW vs the reference optax chain — exact numerical parity.

The fused single-pass optimizer (richsem_tpu/train/optim.py:fused_adamw)
must reproduce chain(clip_by_global_norm, scale_by_adam,
add_decayed_weights(mask), scale(group), scale_by_learning_rate) —
the composition matching the reference recipe (main.py:289-297:
AdamW(lr groups, weight_decay) + engine.py:103-113 grad clip 0.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from richsem_tpu.train.optim import fused_adamw


def _chain(scales, schedule, clip_max_norm, weight_decay):
    trainable_mask = jax.tree.map(lambda s: s > 0, scales)

    def scale_updates():
        def init_fn(params):
            return optax.EmptyState()

        def update_fn(updates, state, params=None):
            return jax.tree.map(lambda u, s: u * s, updates, scales), state

        return optax.GradientTransformation(init_fn, update_fn)

    return optax.chain(
        optax.clip_by_global_norm(clip_max_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay, mask=trainable_mask),
        scale_updates(),
        optax.scale_by_learning_rate(schedule),
    )


@pytest.mark.parametrize("clip_max_norm", [0.1, 1e6])
def test_fused_matches_chain(clip_max_norm):
    rng = np.random.default_rng(0)
    params = {
        "backbone": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
        "head": {
            "w": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
            "frozen": jnp.asarray(rng.normal(size=(4,)), jnp.float32),
        },
    }
    scales = {"backbone": 0.1, "head": {"w": 1.0, "frozen": 0.0}}

    def schedule(step):
        return 1e-3 * jnp.where(step >= 3, 0.1, 1.0)

    wd = 1e-4
    tx_f = fused_adamw(scales, schedule, clip_max_norm, wd)
    tx_c = _chain(scales, schedule, clip_max_norm, wd)

    pf = params
    pc = jax.tree.map(jnp.copy, params)
    sf = tx_f.init(pf)
    sc = tx_c.init(pc)

    @jax.jit
    def step_f(p, s, g):
        u, s2 = tx_f.update(g, s, p)
        return optax.apply_updates(p, u), s2

    @jax.jit
    def step_c(p, s, g):
        u, s2 = tx_c.update(g, s, p)
        return optax.apply_updates(p, u), s2

    for i in range(6):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape) * (10.0 if i % 2 else 0.01),
                jnp.float32,
            ),
            params,
        )
        pf, sf = step_f(pf, sf, g)
        pc, sc = step_c(pc, sc, g)

    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pc)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # frozen leaf never moves
    np.testing.assert_array_equal(pf["head"]["frozen"], params["head"]["frozen"])
    # pre-clip grad norm is exposed for the metrics path
    assert float(sf.gnorm) > 0.0
