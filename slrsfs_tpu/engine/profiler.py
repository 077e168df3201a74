"""Stage-level profiling harness.

The reference instruments per-stage wall clock behind DEBUG_TIME flags with
``torch.cuda.synchronize()`` brackets (``test_baseline_4eval_rawsize.py:
187-202,209-233``). TPU equivalent: the same stage names, timed with forced
completion (scalar readback — ``block_until_ready`` alone returns early on
the axon-tunneled platform), plus optional ``jax.profiler`` traces.

Usage:
    prof = StageProfiler()
    with prof.stage("t_encoder"):
        fs = ...; prof.force(fs)
    print(prof.report())

    with profile_trace("/tmp/trace"):   # XLA/TPU trace for tensorboard
        run()
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np


def force(x):
    """Force device completion of a pytree (tunnel-safe)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]
    return x


class StageProfiler:
    """AverageMeter-style per-stage timings (reference stage names:
    t_encoder, t_euler_integration, t_softmax_splating, t_decoder, ...)."""

    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.times[name].append(time.perf_counter() - t0)

    force = staticmethod(force)

    def report(self) -> str:
        rows = []
        for k, v in self.times.items():
            rows.append(f"{k}: mean {np.mean(v)*1000:.2f}ms "
                        f"min {np.min(v)*1000:.2f}ms n={len(v)}")
        return "\n".join(rows)

    def means(self) -> Dict[str, float]:
        return {k: float(np.mean(v)) for k, v in self.times.items()}


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace (viewable in tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
