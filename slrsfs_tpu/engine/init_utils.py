"""Initialization helpers.

Freshly-initialized spectral-norm layers have random (u, v) whose estimated
sigma is far from the true spectral norm, so W/sigma can be very large and a
deep stack overflows float32 (the reference has the same property; its
checkpoints always carry settled u/v from training). ``settle`` runs a few
train-mode passes, updating only the ``spectral`` and ``batch_stats``
collections, to bring random-init variables into a numerically sane regime
for benchmarks and smoke tests."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def settle(model, variables, example_args, n: int = 8, method=None):
    """Run ``n`` train-mode forward passes updating spectral u/v and BN stats.

    example_args: tuple of positional args after ``variables`` (the module's
    call signature must accept (..., train, deterministic)). The step is
    jitted: on the axon-tunneled TPU, un-jitted flax applies execute eagerly
    op-by-op over the tunnel (minutes instead of seconds).
    """

    @jax.jit
    def one(variables):
        _, updates = model.apply(
            variables,
            *example_args,
            True,  # train
            True,  # deterministic (no noise rng needed)
            mutable=["spectral", "batch_stats"],
            method=method,
        )
        return {**variables, **updates}

    for _ in range(n):
        variables = one(variables)
    return variables


def jit_init(model, rngs, *args, method=None):
    """Jitted model.init — mandatory on the axon TPU (eager init is ~100x
    slower over the tunnel)."""

    @jax.jit
    def go():
        return model.init(rngs, *args, method=method)

    return go()
