"""Compile + run the shard_map-wrapped Pallas kernels on the REAL chip.

The virtual-mesh dryrun runs Pallas in interpret mode (CPU devices); this
proves the Mosaic lowering of the shard_map path itself — BlockSpec
index_maps over sharded planes, the psum'd col correction dot, the expert
gather — on TPU hardware with a 1-device mesh (the only mesh this
environment can build), checking parity against the unsharded kernel and
timing a decode-shaped matvec chain.

Run: python scripts/shardmap_on_chip.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh


def main():
    from llamacog_tpu.ops.pallas.qmm import qmm
    from llamacog_tpu.parallel import pallas_shard as PS
    from llamacog_tpu.quant.planar import QuantTensor
    from llamacog_tpu.utils.synthetic import _rand_qt

    assert jax.default_backend() == "tpu", "run on the chip"
    devs = np.array(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(devs, ("data", "model"))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 99), (1, 4096), jnp.bfloat16)

    for kind, pspec in (("Q4_K", "row"), ("Q6_K", "row"), ("Q4_K", "col"),
                        ("Q8_0", "col")):
        base = _rand_qt(jax.random.fold_in(key, hash(kind + pspec) % 997),
                        kind, 4096, 4096)
        qt = QuantTensor(base.kind, base.shape, base.planes, pspec)
        ref = qmm(x, qt)
        out = PS.sharded_qmm(x, qt, mesh)
        assert out is not None, f"{kind}/{pspec} unsupported"
        err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        # timed: chained matvecs through the shard_map'd kernel
        f = jax.jit(lambda xx: PS.sharded_qmm(xx, qt, mesh)[:, :4096]
                    .astype(jnp.bfloat16))
        y = f(x); jax.block_until_ready(y)
        t0 = time.time()
        for _ in range(50):
            y = f(y)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / 50
        gb = sum(int(np.prod(p.shape)) * p.dtype.itemsize
                 for p in qt.planes.values()) / 1e9
        print(f"shard_map qmm {kind:5s}/{pspec}: rel_err {err:.2e}, "
              f"{dt*1e6:.0f} us/call ({gb/dt:.0f} GB/s)")
        assert err < 2e-2, f"{kind}/{pspec} parity fail"

    print("shard_map qmm on-chip Mosaic lowering: OK")


if __name__ == "__main__":
    main()
