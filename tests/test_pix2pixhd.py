"""Weight-transfer parity of the pix2pixHD nets vs the reference
models/networks/networks.py modules (GlobalGenerator, LocalEnhancer,
'pix2pixHDorigin' multiscale discriminator)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_ref import assert_close, install_tv_stub, to_nchw, to_nhwc  # noqa: E402

install_tv_stub()
import sys  # noqa: E402

sys.path.insert(0, "/root/reference")
from models.networks import networks as refnet  # noqa: E402

from slrsfs_tpu.nn.pix2pixhd import (  # noqa: E402
    GlobalGenerator,
    LocalEnhancer,
    OriginMultiscaleDiscriminator,
    import_global_generator,
    import_local_enhancer,
    import_origin_discriminator,
)


def test_global_generator_parity():
    import functools

    import torch.nn as tnn

    norm = functools.partial(tnn.InstanceNorm2d, affine=False)
    tm = refnet.GlobalGenerator(3, 3, ngf=8, n_downsampling=2, n_blocks=2,
                                norm_layer=norm)
    tm.apply(refnet.weights_init)
    tm.eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = to_nhwc(tm(to_nchw(x)))

    variables = import_global_generator(tm.state_dict(),
                                        n_downsampling=2, n_blocks=2)
    m = GlobalGenerator(out_channels=3, ngf=8, n_downsampling=2, n_blocks=2)
    got = jax.jit(m.apply)(variables, jnp.asarray(x))
    assert_close(got, want, rel=2e-4)


def test_local_enhancer_parity():
    import functools

    import torch.nn as tnn

    norm = functools.partial(tnn.InstanceNorm2d, affine=False)
    tm = refnet.LocalEnhancer(3, 3, ngf=8, n_downsample_global=2,
                              n_blocks_global=2, n_local_enhancers=1,
                              n_blocks_local=2, norm_layer=norm)
    tm.apply(refnet.weights_init)
    tm.eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = to_nhwc(tm(to_nchw(x)))

    variables = import_local_enhancer(tm.state_dict(), n_downsample_global=2,
                                      n_blocks_global=2, n_blocks_local=2)
    m = LocalEnhancer(out_channels=3, ngf=8, n_downsample_global=2,
                      n_blocks_global=2, n_blocks_local=2)
    got = jax.jit(m.apply)(variables, jnp.asarray(x))
    assert_close(got, want, rel=2e-4)


def test_origin_discriminator_parity():
    """define_D config of gan_loss.py:138-144 (input_nc=2, instance norm,
    num_D=2, getIntermFeat=False), at test-size ndf."""
    tm = refnet.define_D(input_nc=2, ndf=8, n_layers_D=3, norm="instance",
                         use_sigmoid=False, num_D=2, getIntermFeat=False)
    tm.eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 64, 64, 2)).astype(np.float32)
    with torch.no_grad():
        want = tm(to_nchw(x))

    variables = import_origin_discriminator(tm.state_dict(), num_D=2,
                                            n_layers=3)
    m = OriginMultiscaleDiscriminator(ndf=8, n_layers=3, num_D=2)
    got = jax.jit(m.apply)(variables, jnp.asarray(x))
    assert len(got) == 2 and all(len(s) == 1 for s in got)
    for scale in range(2):
        assert_close(got[scale][0], to_nhwc(want[scale][0]), rel=2e-4)


# Trainer integration of the origin D (one motion GAN step, GAN_Feat==0)
# lives in tests/test_stage_trainers.py::test_motion_gan_train_step so the
# suite compiles only one 256² motion train-step graph.
