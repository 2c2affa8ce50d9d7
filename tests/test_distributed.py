"""Two-process jax.distributed on CPU: the multi-host init path
(parallel/distributed.init_distributed — the reference rpc-server role,
SURVEY §2.4) must actually wire two processes into one runtime and run a
sharded computation across their devices."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

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


_ENGINE_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from llamacog_tpu.parallel.distributed import init_distributed

coord, model_path, out_path = sys.argv[1], sys.argv[4], sys.argv[5]
info = init_distributed(coord, int(sys.argv[2]), int(sys.argv[3]))
assert info["hosts"] == 2 and info["devices"] == 4, info

import numpy as np
import jax.numpy as jnp
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.parallel.sharding import make_mesh
from llamacog_tpu.runtime.engine import Engine

# TP mesh spanning BOTH processes' devices (2 local x 2 hosts)
mesh = make_mesh(1, 4)
m = load_model(model_path, with_tokenizer=False, dtype=jnp.float32)
eng = Engine(m.params, m.config, batch_size=1, max_seq=64,
             dtype=jnp.float32, mesh=mesh)
prompt = [1, 2, 3, 4]
logits = eng.prefill(prompt)          # prefill across the process boundary
l_dec = eng.decode_one(np.array([5])) # decode step
toks = eng.decode_greedy_tokens(np.array([7]), 8)  # on-device greedy loop
if info["host_id"] == 0:
    np.savez(out_path, logits=logits, l_dec=l_dec[0], toks=toks[0])
print(f"proc {info['host_id']} engine ok")
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


@pytest.mark.slow
def test_two_process_sharded_engine(tmp_path):
    """The FULL Engine (TP-sharded weights + KV, prefill, decode, on-device
    greedy loop) across a 2-process mesh, logits/tokens compared against the
    single-process engine (the reference's rpc multi-host role actually
    serving, not just a toy allreduce)."""
    import numpy as np

    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    model_path = make_tiny_llama_gguf(
        str(tmp_path / "dist.gguf"), n_embd=64, n_head=8, n_head_kv=4, n_ff=128,
    )

    # single-process reference (current pytest process, no mesh)
    m = load_model(model_path, with_tokenizer=False, dtype=jnp.float32)
    ref_eng = Engine(m.params, m.config, batch_size=1, max_seq=64,
                     dtype=jnp.float32)
    ref_logits = ref_eng.prefill([1, 2, 3, 4])
    ref_dec = ref_eng.decode_one(np.array([5]))[0]
    ref_toks = ref_eng.decode_greedy_tokens(np.array([7]), 8)[0]

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out_path = str(tmp_path / "proc0.npz")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    script = tmp_path / "engine_worker.py"
    script.write_text(_ENGINE_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(i), model_path,
             out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "engine ok" in out

    z = np.load(out_path)
    np.testing.assert_allclose(z["logits"], ref_logits, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(z["l_dec"], ref_dec, atol=2e-4, rtol=1e-4)
    np.testing.assert_array_equal(z["toks"], ref_toks)
