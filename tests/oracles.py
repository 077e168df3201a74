"""Pure-numpy oracles re-deriving the reference kernel math.

These are loop-level transliterations of the semantics documented in
SURVEY.md §2.1 (reference models/softsplat.py CUDA source strings and
models/projection/euler_integration_manipulator.py), used to validate the
vectorized JAX ops.
"""

import numpy as np


def splat_sum_np(inp, flow):
    """inp (H, W, C), flow (H, W, 2) -> (H, W, C)."""
    H, W, C = inp.shape
    out = np.zeros_like(inp)
    for y in range(H):
        for x in range(W):
            ox = x + flow[y, x, 0]
            oy = y + flow[y, x, 1]
            x0 = int(np.floor(ox))
            y0 = int(np.floor(oy))
            dx = ox - x0
            dy = oy - y0
            for cx, cy, w in (
                (x0, y0, (1 - dx) * (1 - dy)),
                (x0 + 1, y0, dx * (1 - dy)),
                (x0, y0 + 1, (1 - dx) * dy),
                (x0 + 1, y0 + 1, dx * dy),
            ):
                if 0 <= cx < W and 0 <= cy < H:
                    out[cy, cx] += inp[y, x] * w
    return out


def splat_grad_np(inp, flow, g):
    """Backward of splat_sum. Returns (grad_inp, grad_flow)."""
    H, W, C = inp.shape
    grad_inp = np.zeros_like(inp)
    grad_flow = np.zeros_like(flow)
    for y in range(H):
        for x in range(W):
            ox = x + flow[y, x, 0]
            oy = y + flow[y, x, 1]
            x0 = int(np.floor(ox))
            y0 = int(np.floor(oy))
            dx = ox - x0
            dy = oy - y0
            corners = (
                (x0, y0, (1 - dx) * (1 - dy), -(1 - dy), -(1 - dx)),
                (x0 + 1, y0, dx * (1 - dy), (1 - dy), -dx),
                (x0, y0 + 1, (1 - dx) * dy, -dy, (1 - dx)),
                (x0 + 1, y0 + 1, dx * dy, dy, dx),
            )
            for cx, cy, w, dwx, dwy in corners:
                if 0 <= cx < W and 0 <= cy < H:
                    grad_inp[y, x] += g[cy, cx] * w
                    inner = float(np.sum(inp[y, x] * g[cy, cx]))
                    grad_flow[y, x, 0] += inner * dwx
                    grad_flow[y, x, 1] += inner * dwy
    return grad_inp, grad_flow


def max_splat_np(inp, flow, init=-1000.0):
    H, W, C = inp.shape
    out = np.full_like(inp, init)
    for y in range(H):
        for x in range(W):
            ox = x + flow[y, x, 0]
            oy = y + flow[y, x, 1]
            x0 = int(np.floor(ox))
            y0 = int(np.floor(oy))
            dx = ox - x0
            dy = oy - y0
            for cx, cy, w in (
                (x0, y0, (1 - dx) * (1 - dy)),
                (x0 + 1, y0, dx * (1 - dy)),
                (x0, y0 + 1, (1 - dx) * dy),
                (x0 + 1, y0 + 1, dx * dy),
            ):
                if 0 <= cx < W and 0 <= cy < H:
                    out[cy, cx] = np.maximum(out[cy, cx], inp[y, x] * w)
    return out


def maximum_warp_norm_np(inp, flow):
    H, W, C = inp.shape
    mx = max_splat_np(inp, flow)
    out = inp.copy()
    for y in range(H):
        for x in range(W):
            ox = x + flow[y, x, 0]
            oy = y + flow[y, x, 1]
            x0 = int(np.floor(ox))
            y0 = int(np.floor(oy))
            for cx, cy in ((x0, y0), (x0 + 1, y0), (x0, y0 + 1), (x0 + 1, y0 + 1)):
                if 0 <= cx < W and 0 <= cy < H:
                    out[y, x] = np.maximum(out[y, x], mx[cy, cx])
    return out


def euler_integration_np(motion, n_steps):
    """motion (H, W, 2); loop transliteration of the reference integrator.

    Returns (displacement (H, W, 2), visible (H, W)) after n_steps.
    """
    H, W, _ = motion.shape
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    coord = np.stack([gx, gy], axis=-1)
    dest = coord.copy()
    invalid = np.zeros((H, W), bool)
    for _ in range(n_steps):
        # round-half-to-even like torch.round / jnp.round
        ix = np.clip(np.rint(dest[..., 0]).astype(int), 0, W - 1)
        iy = np.clip(np.rint(dest[..., 1]).astype(int), 0, H - 1)
        dest = dest + motion[iy, ix]
        oob = (
            (dest[..., 0] > W - 1)
            | (dest[..., 0] < 0)
            | (dest[..., 1] > H - 1)
            | (dest[..., 1] < 0)
        )
        invalid |= oob
        dest[invalid] = coord[invalid]
    disp = dest - coord
    disp[invalid] = max(H, W) + 1
    return disp, (~invalid).astype(np.float64)
