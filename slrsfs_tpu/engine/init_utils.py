"""Initialization helpers.

Freshly-initialized spectral-norm layers have random (u, v) whose estimated
sigma is far from the true spectral norm, so W/sigma can be very large and a
deep stack overflows float32 (the reference has the same property; its
checkpoints always carry settled u/v from training). ``settle`` runs a few
train-mode passes, updating only the ``spectral`` and ``batch_stats``
collections, to bring random-init variables into a numerically sane regime
for benchmarks and smoke tests."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def enable_persistent_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache for CLIs/benchmarks.

    The SLR bf16 rollout costs minutes to compile (BENCH_r02 tail); the
    cache is keyed by HLO hash so a re-run (or the next scene sweep) pays
    ~0 instead. Tests already do this (tests/conftest.py:23-28); CLIs call
    this at startup. Override the location with SLRSFS_JAX_CACHE; set it to
    the empty string to disable."""
    env = os.environ.get("SLRSFS_JAX_CACHE")
    if env == "":
        return
    cache_dir = env or cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "slrsfs_tpu", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


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
