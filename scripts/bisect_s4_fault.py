"""Find which production shape/path faults the TPU worker under Q4_KS4.

The standalone s4 kernel is clean at [28672,4096] tn=512 (exp_s4.py) but
the full 8B decode graph crashes the worker. Runs the PRODUCTION
_qmm_call / qmm_multi paths per shape, one subprocess per case so a
worker crash is contained and attributed.

Run: python scripts/bisect_s4_fault.py            # orchestrates
     python scripts/bisect_s4_fault.py CASE       # one case, in-process
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = {
    "gate_up": ("single", 28672, 4096),
    "qk_alone": ("single", 5120, 4096),
    "wo": ("single", 4096, 4096),
    "down": ("single", 4096, 14336),
    "qk_v_multi": ("multi", 5120, 4096),
    "head_q6k": ("q6k", 128256, 4096),
}


def run_case(name):
    os.environ["LLAMACOG_Q4_S4"] = "1"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llamacog_tpu.utils.synthetic import _rand_qt
    from llamacog_tpu.ops.pallas.qmm import qmm, qmm_multi

    mode, n, k = CASES[name]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 9), (1, k), jnp.float32)
    if mode == "q6k":
        qt = _rand_qt(key, "Q6_K", n, k)
        out = qmm(x, qt)
    elif mode == "single":
        qt = _rand_qt(key, "Q4_K", n, k)
        assert qt.kind == "Q4_KS4", qt.kind
        out = qmm(x, qt)
    else:
        qk = _rand_qt(key, "Q4_K", n, k)
        v = _rand_qt(jax.random.fold_in(key, 1), "Q6_K", 1024, k)
        out = qmm_multi(x, [qk, v])[0]
    v = float(np.asarray(out).sum())
    print(f"{name}: OK (sum {v:.3e})")


def main():
    if len(sys.argv) > 1:
        run_case(sys.argv[1])
        return
    for name in CASES:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, timeout=900, text=True,
        )
        tail = (r.stdout + r.stderr).strip().splitlines()
        msg = tail[-1][:140] if tail else ""
        print(f"[{name}] rc={r.returncode} {msg}", flush=True)


if __name__ == "__main__":
    main()
