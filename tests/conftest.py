import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. The harness environment force-selects the
# 'axon' TPU platform (JAX_PLATFORMS=axon via sitecustomize), so overriding
# the env var alone is not enough — jax.config must be updated before the
# backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound on CPU, and
# most test programs are identical across runs. Keyed by HLO hash, so source
# edits that change the program safely miss.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# The CLI e2e tests call cli.{train,render,render_all}.main() in-process;
# those entry points call engine.init_utils.enable_persistent_cache(),
# which would RE-POINT the cache dir to ~/.cache for the rest of the pytest
# session — every graph first compiled after that test would then miss this
# warm cache (measured: +3.5 min on a full run whose new graphs landed
# after test_cli_e2e). The env override pins the CLIs to the same dir.
os.environ["SLRSFS_JAX_CACHE"] = _CACHE_DIR

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", jax.devices()


# The suite is TRACE-bound, and CPython's generational GC re-traverses every
# live object on each gen-2 collection — by late in the run the accumulated
# jit caches (jaxprs, lowered programs) are millions of nodes, inflating
# per-test trace time ~30-40% (measured: test_slr_train_step 22 s module-
# alone vs 31 s in-suite). Freezing after each module moves the surviving
# caches into the permanent generation the collector never scans; cyclic
# garbage created within a module is still reclaimed by the collect() just
# before the freeze. RSS cost is bounded by what the caches hold anyway.
import pytest as _pytest  # noqa: E402


@_pytest.fixture(autouse=True, scope="module")
def _gc_freeze_caches():
    yield
    import gc

    gc.collect()
    gc.freeze()


def tiny_options(**kw):
    """Minimal-compile Options for trainer/engine MECHANICS tests (2-block
    TinyTest archs, small D). Parity tests must keep the real reference
    archs — never use this there."""
    from slrsfs_tpu.config import Options

    base = dict(
        ngf=8, out_channel=9, W=16,
        refine_model_type="resnet_TinyTest_de_resnet_pconv2_nonorm",
        alpha_refine_model_type="resnet_TinyTest_de_resnet_pconv2_nonorm",
        bg_refine_model_type="resnet_TinyTestBG_nonorm",
        ndf=8, num_D=1, n_layers_D=2,
        # the reference's 8-down/8-up motion UNets need >=256-squared input;
        # width 4 + depth 4 (min input 16²) keep the mechanics-test graphs
        # cheap on the 1-CPU suite host (parity tests use real Options ->
        # reference width 32 / depth 8 at 256²)
        motion_num_filters=4,
        motion_unet_downs=4,
    )
    base.update(kw)
    return Options(**base)


import pytest as _pytest  # noqa: E402


@_pytest.fixture(autouse=True)
def _seed_torch_rng():
    """Deterministic torch global RNG per test: the parity tests build
    reference torch modules whose weights otherwise come from the unseeded
    global generator, making failures nondeterministic."""
    try:
        import torch

        torch.manual_seed(0)
    except ImportError:
        pass
    yield


import json
import numpy as np
import pytest
from PIL import Image

from slrsfs_tpu.data.tensors import save_motion
from slrsfs_tpu.utils.flow_viz import write_flo


@pytest.fixture(scope="session")
def real32_env():
    """Settled REAL-arch (ngf=16) baseline at the canonical (1, 32, 32, 3)
    shape, shared across modules: the full 8-block encoder/decoder graph
    costs ~5 s per trace on this 1-core host and two modules
    (test_models_parity, test_rollout_sparse) otherwise init+settle it
    independently (VERDICT r4 #5). Assertions using it are self-consistent
    (engine-path equality with the same variables), so ANY settled
    variables serve."""
    import jax
    import jax.numpy as jnp

    from slrsfs_tpu.config import Options
    from slrsfs_tpu.engine.init_utils import jit_init, settle
    from slrsfs_tpu.models.baseline import BaselineModel

    rng = np.random.default_rng(5)
    opt = Options(ngf=16, W=32)
    model = BaselineModel(opt)
    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32) * 0.25
    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, False, True,
    )
    variables = settle(model, variables, (jnp.asarray(img),), n=2)
    return dict(opt=opt, model=model, img=img, variables=variables)


@pytest.fixture(scope="session")
def vgg_vars32():
    """One jitted VGG19Features init shared by every trainer mechanics test
    (via ``trainer.load_vgg``): VGG params are input-size-independent and
    each per-test ``init_vgg`` re-trace costs ~1 s on this host. Loss-value
    assertions are all self-consistent (same trainer both sides), so ANY
    fixed weights serve."""
    import jax

    from slrsfs_tpu.nn.vgg import VGG19Features

    vgg = VGG19Features()
    img = np.zeros((1, 32, 32, 3), np.float32)
    return jax.jit(lambda r: vgg.init(r, img))(jax.random.PRNGKey(4))


def tiny_batch(rng, B=2, H=32, W=32):
    """The shared 3-view training batch of the trainer mechanics tests."""
    import jax.numpy as jnp

    idx = np.zeros((B, 3), np.int32)
    idx[:, 1] = rng.integers(1, 4, size=B)
    idx[:, 2] = 4
    return {
        "images": [
            jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.25, jnp.float32)
            for _ in range(3)
        ],
        "index": jnp.asarray(idx),
        "motions": jnp.asarray(rng.standard_normal((B, H, W, 2)) * 0.5,
                               jnp.float32),
    }


@pytest.fixture(scope="session")
def base_trainer(vgg_vars32):
    """Shared trainer/state/jitted-steps for the mechanics tests: tracing a
    G+D train-step graph costs ~10 s on this 1-core host, so every test
    re-building an identical trainer pays it again (VERDICT r2 #9).
    Session-scoped: test_trainer AND test_checkpoint (orbax round-trip)
    reuse one init. No test mutates the returned objects (JAX states are
    immutable; the jitted steps are donation-free)."""
    import jax

    from slrsfs_tpu.engine.trainer import Trainer
    from slrsfs_tpu.models.baseline import BaselineTrainable

    opt = tiny_options(W=32, batch_size=2)
    model = BaselineTrainable(opt, train_max_steps=4)
    trainer = Trainer(opt, model, steps_per_epoch=10)
    trainer.load_vgg(vgg_vars32)
    batch = tiny_batch(np.random.default_rng(0))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return {
        "opt": opt,
        "trainer": trainer,
        "batch": batch,
        "state": state,
        "step1": jax.jit(trainer.make_train_step()),
        "step2": jax.jit(trainer.make_train_step(accum=2)),
    }


@pytest.fixture(scope="session")
def fixture_root(tmp_path_factory):
    """Two tiny synthetic scenes in the reference on-disk layout."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("liquid")
    H, W, N = 96, 160, 12
    for split in ("train", "validation"):
        os.makedirs(root / split, exist_ok=True)
    os.makedirs(root / "avr_image", exist_ok=True)
    os.makedirs(root / "rock_label", exist_ok=True)
    rng = np.random.default_rng(0)
    for split, scenes in (("train", ["00001_00000", "00002_00000"]),
                          ("validation", ["00980_00000"])):
        for scene in scenes:
            path = str(root / split / f"{scene}_gt.mp4")
            vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                                 (W, H))
            base = rng.integers(0, 255, (H, W, 3), np.uint8)
            for t in range(N):
                frame = np.roll(base, shift=t, axis=1)
                vw.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            vw.release()
            motion = np.zeros((H, W, 2), np.float32)
            motion[H // 2 :, :, 0] = 1.0
            save_motion(str(root / split / f"{scene}_motion.npz"), motion)
            write_flo(str(root / split / f"{scene}_sparse_motion.flo"),
                      motion * 0.5)
            Image.fromarray(base).save(root / "avr_image" / f"{scene}.png")
    # one rock label
    label = {
        "width": W, "height": H,
        "step_1": {"result": [{"pointList": [
            {"x": 5, "y": 5}, {"x": 40, "y": 5}, {"x": 40, "y": 30},
            {"x": 5, "y": 30}]}]},
    }
    with open(root / "rock_label" / "00001_00000.png.json", "w") as f:
        json.dump(label, f)
    return str(root)

