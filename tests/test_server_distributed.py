"""Serve THROUGH a multi-process mesh (VERDICT r3 missing #1).

Launches `llamacog_tpu.server` on a 2-process CPU mesh (2 virtual devices
per process, TP=4 over both): process 0 answers HTTP, process 1 replays the
mirrored engine calls (parallel/mirror.py). A /v1/chat/completions request
must return the same tokens as a single-process server — the reference's
multi-host serving role (`llama-server --rpc h1,h2`,
tools/rpc/rpc-server.cpp) actually answering a request."""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices=2):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    return env


def _wait_health(port, procs, timeout=420):
    t0 = time.time()
    while time.time() - t0 < timeout:
        for p in procs:
            if p.poll() is not None:
                out = p.stdout.read().decode() if p.stdout else ""
                raise AssertionError(f"server process died rc={p.returncode}:\n{out}")
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=5
            ) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(1.0)
    raise AssertionError("server did not become healthy")


def _chat(port, n=8):
    body = json.dumps({
        "messages": [{"role": "user", "content": "Once upon a time"}],
        "temperature": 0.0,
        "max_tokens": n,
        "stream": False,
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def _completion(port, n=8):
    body = json.dumps({
        "prompt": "The quick brown fox",
        "temperature": 0.0,
        "n_predict": n,
        "stream": False,
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/completion", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def _kill(procs):
    for p in procs:
        if p.poll() is None:
            p.kill()
    for p in procs:
        try:
            p.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            pass


@pytest.mark.slow
def test_serve_through_two_process_mesh(tmp_path):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    model_path = make_tiny_llama_gguf(
        str(tmp_path / "srv.gguf"), n_embd=64, n_head=8, n_head_kv=4, n_ff=128,
    )

    # --- single-process reference server
    ref_port = _free_port()
    ref = subprocess.Popen(
        [sys.executable, "-m", "llamacog_tpu.server", "-m", model_path,
         "--device", "cpu", "--port", str(ref_port), "-np", "2",
         "-c", "256", "--dtype", "f32"],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        _wait_health(ref_port, [ref])
        ref_chat = _chat(ref_port)
        ref_comp = _completion(ref_port)
    finally:
        _kill([ref])
    ref_text = ref_chat["choices"][0]["message"]["content"]
    ref_comp_text = ref_comp["content"]

    # --- 2-process TP=4 mesh server (the multi-host layout on CPU devices)
    port = _free_port()
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "llamacog_tpu.server", "-m", model_path,
             "--device", "cpu", "--port", str(port), "-np", "2",
             "-c", "256", "--dtype", "f32", "-tp", "4",
             "--coordinator", coord, "--num-hosts", "2", "--host-id", str(i)],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    try:
        _wait_health(port, procs)
        got_chat = _chat(port)
        got_comp = _completion(port)
        # second request exercises prefix-cache reuse + set_seq_len mirroring
        got_chat2 = _chat(port)
    finally:
        _kill(procs)

    assert got_chat["choices"][0]["message"]["content"] == ref_text
    assert got_comp["content"] == ref_comp_text
    assert got_chat2["choices"][0]["message"]["content"] == ref_text
