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
