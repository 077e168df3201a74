"""slrsfs_tpu — TPU-native still-image fluid animation framework.

A brand-new JAX / XLA / Pallas implementation with the capabilities of
simon3dv/SLR-SFS ("Simulating Fluids in Real-World Still Images", ICCV 2023):
given a single still image, a dense (or sparse-hint-regressed) Eulerian motion
field and a fluid mask, render an N-frame looping video by Euler-integrating
the motion field once (lax.scan, O(N)), softmax-splatting encoder features
symmetrically from both temporal ends, and decoding — with the two-layer SLR
variant alpha-compositing a warped fluid layer over a hallucinated static
background.

Internal tensor layout is NHWC (TPU-native); flows are (..., H, W, 2) with
channel order (u = x-displacement, v = y-displacement), matching the
reference's (B, 2, H, W) convention after transpose.
"""

__version__ = "0.1.0"
