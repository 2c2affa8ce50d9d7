"""Multi-host initialization (the reference's RPC backend role, §2.4).

The reference scales past one box with ggml-rpc (a TCP tensor-op protocol,
tools/rpc/rpc-server.cpp) — explicit client/server plumbing. On TPU pods the
idiomatic equivalent is `jax.distributed`: every host runs the same program,
`initialize()` wires the hosts into one runtime, and `jax.devices()` then
spans the whole slice, so the existing (data, model) mesh and NamedShardings
(parallel/sharding.py) scale to multi-host with zero model-code changes —
collectives ride ICI within a slice and DCN across slices, inserted by XLA.

Serving layout (SURVEY §2.5/§7.6): one controller host runs the HTTP server
and tokenization; logits land on host 0 via `jax.device_get` of an
`addressable_shards`-replicated output. Worker hosts just run the jitted
step. `llamacog-server --coordinator host:port --num-hosts N` on each host
is the whole deployment story.
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator: str | None = None,
    num_hosts: int | None = None,
    host_id: int | None = None,
) -> dict:
    """Initialize jax.distributed from args or standard env vars.

    Environment fallbacks (the JAX conventions): JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID. On Cloud TPU pods with the TPU
    runtime metadata available, bare `jax.distributed.initialize()` (all
    None) autodetects everything.

    Returns {"hosts": N, "host_id": i, "devices": total, "local": k}.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_hosts is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_hosts = int(os.environ["JAX_NUM_PROCESSES"])
    if host_id is None and os.environ.get("JAX_PROCESS_ID"):
        host_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator or num_hosts:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_hosts,
            process_id=host_id,
        )
    elif os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()  # TPU pod autodetection
        except ValueError:
            pass  # single-host / no pod metadata: stay local
    return {
        "hosts": jax.process_count(),
        "host_id": jax.process_index(),
        "devices": len(jax.devices()),
        "local": len(jax.local_devices()),
    }


def is_controller() -> bool:
    """True on the host that should run the HTTP server / print output."""
    import jax

    return jax.process_index() == 0
