"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports,
so multi-chip sharding paths run as a 'fake cluster' on any machine
(the JAX-native analogue of a fake distributed backend)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override (env may preset a TPU platform)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment may pre-import jax config (e.g. a TPU platform plugin in
# sitecustomize), in which case the env vars above are read too late — force
# the settings through jax.config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: repeat suite runs skip the expensive CPU
# compiles of the model-sized programs (a separate cache dir from the TPU
# one — entries are keyed by backend, this just avoids mixing)
from rtm3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/rtm3d_tpu_xla_tests"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.RandomState(20)


@pytest.fixture(scope="session")
def base_prog():
    """One shared traced+compiled train/eval program for the canonical small
    config (ResNet-18 @64x64). Tracing + lowering the full train step is the
    dominant cost of the fast suite; tests that only need *a* correct base
    program (vs a config variant) reuse this instead of building their own.
    step_fn/eval_fn are pure — tests derive fresh TrainStates from
    `variables` and never mutate the fixture."""
    from rtm3d_tpu.nn.model import init_model
    from rtm3d_tpu.train.optim import build_optimizer
    from rtm3d_tpu.train.step import make_eval_loss_step, make_train_step
    from tests.test_train_step import small_cfg

    cfg = small_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, variables["params"])
    return {
        "cfg": cfg,
        "model": model,
        "variables": variables,
        "tx": tx,
        "step_fn": make_train_step(model, cfg, tx),
        "eval_fn": make_eval_loss_step(model, cfg),
    }
