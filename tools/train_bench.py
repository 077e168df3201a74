"""Training-step throughput on the flagship baseline config.

Measures one optimizer step (G fwd/bwd incl. Euler scan + splat VJP + VGG
perceptual + multiscale GAN, then the D step) at the reference's shipped
training shapes (batch 16, W=256 — train_baseline2_pconv.sh). The reference
publishes no training throughput; this records ours for the round notes.

Run on the TPU: python tools/train_bench.py [batch_size] [W]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from slrsfs_tpu.config import Options
    from slrsfs_tpu.engine.trainer import Trainer
    from slrsfs_tpu.models.baseline import BaselineTrainable

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    opt = Options(W=W, batch_size=B)
    model = BaselineTrainable(opt, train_max_steps=60)
    trainer = Trainer(opt, model, steps_per_epoch=500)

    rng = np.random.default_rng(0)

    def imgs():
        return jnp.asarray(rng.standard_normal((B, W, W, 3)) * 0.25,
                           jnp.float32)

    idx = np.zeros((B, 3), np.int32)
    idx[:, 1] = rng.integers(1, 59, size=B)
    idx[:, 2] = 59
    batch = {
        "images": [imgs(), imgs(), imgs()],
        "index": jnp.asarray(idx),
        "motions": jnp.asarray(
            rng.standard_normal((B, W, W, 2)) * 2.0, jnp.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.make_train_step(), donate_argnums=(0,))

    t0 = time.perf_counter()
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    total = float(np.asarray(logs["Total Loss"]))
    compile_s = time.perf_counter() - t0
    print(f"# compile+first step: {compile_s:.1f}s loss={total:.3f}",
          file=sys.stderr)

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        state, logs = step(state, batch, jax.random.PRNGKey(2 + i))
        float(np.asarray(logs["Total Loss"]))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"train_step: batch={B} W={W} best={best*1000:.1f}ms "
          f"({B / best:.1f} samples/s)")


if __name__ == "__main__":
    main()
