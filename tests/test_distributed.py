"""Two-process jax.distributed on CPU: the multi-host init path
(parallel/distributed.init_distributed — the reference rpc-server role,
SURVEY §2.4) must actually wire two processes into one runtime and run a
sharded computation across their devices."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
# the axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# before first device use is the reliable way to force CPU
jax.config.update("jax_platforms", "cpu")
from llamacog_tpu.parallel.distributed import init_distributed

info = init_distributed(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
assert info["hosts"] == 2, info
assert info["devices"] == 4, info

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(1, 4), ("data", "model"))
x = jnp.arange(8.0).reshape(1, 8)
xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))


@jax.jit
def f(a):
    return (a * 2).sum()


out = float(f(xs))
assert out == 56.0, out
print(f"proc {info['host_id']} ok: {out}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "ok: 56.0" in out
