"""True multi-process SPMD test: two JAX processes + localhost coordinator.

Validates the --multihost code path (jax.distributed.initialize, global
device mesh, per-process data sharding) that replaces the reference's NCCL
rendezvous (train_multi_gpu.py:58-66) — on CPU, as a subprocess fixture.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc
devs = jax.devices()
assert len(devs) == 2 * nproc  # global view
mesh = Mesh(np.asarray(devs).reshape(-1), ("data",))

# per-process shard of a global batch (DataLoader-style striding)
sys.path.insert(0, os.getcwd())
from rtm3d_tpu.parallel.mesh import is_master, local_batch_size

gb = 8
lb = local_batch_size(gb)
assert lb == gb // nproc
local = np.full((lb, 4), float(pid), np.float32)

arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), local, (gb, 4))

@jax.jit
def global_mean(x):
    return x.mean()

m = float(global_mean(arr))
expect = sum(range(nproc)) / nproc  # mean of pids
assert abs(m - expect) < 1e-6, (m, expect)
if is_master():
    print("MULTIHOST_OK", m)
"""


@pytest.mark.skipif(os.environ.get("CI_FAST"), reason="slow subprocess test")
@pytest.mark.slow
def test_two_process_spmd(tmp_path):
    port = "29517"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert any("MULTIHOST_OK" in o for o in outs)
