"""Per-op device-time breakdown of the 8B Q4_K_M decode step.

Captures an XPlane trace of the on-device greedy loop and aggregates TPU
device-plane event durations by op name — the exact where-does-10ms-go
budget the knockout bisect approximates, from one compile and one run.

Run: python scripts/profile_decode8b.py [n_decode]
"""

import collections
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE = "/tmp/llamacog_trace_8b"


def capture(n):
    import jax

    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import llama3_8b_config, make_synthetic_params

    cfg = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)
    kv = os.environ.get("LLAMACOG_PROF_KV", "dense")
    ms = int(os.environ.get("LLAMACOG_PROF_SEQ", "1024"))
    bsz = int(os.environ.get("LLAMACOG_PROF_B", "1"))
    eng = Engine(params, cfg, batch_size=bsz, max_seq=ms, kv_type=kv)
    for row in range(bsz):
        eng.prefill(list(range(2, 130)), row=row) if bsz > 1 else None
    if bsz == 1:
        eng.prefill(list(range(2, 130)))
    eng.decode_greedy_tokens(np.full((bsz,), 5, np.int32), n)  # compile+warm
    eng.reset()
    for row in range(bsz):
        eng.prefill(list(range(2, 130)), row=row) if bsz > 1 else None
    if bsz == 1:
        eng.prefill(list(range(2, 130)))
    os.system(f"rm -rf {TRACE}")
    with jax.profiler.trace(TRACE):
        t1 = time.time()
        eng.decode_greedy_tokens(np.full((bsz,), 7, np.int32), n)
        dt = time.time() - t1
    print(f"[timed] {n/dt:.1f} t/s ({dt/n*1e3:.2f} ms/tok)", file=sys.stderr)
    return dt


def classify(name):
    if "fusion" in name:
        return name
    return name


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = capture(n)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(TRACE + "/**/*.xplane.pb", recursive=True)
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        md = plane.event_metadata
        agg = collections.defaultdict(lambda: [0, 0])  # name -> [ps, count]
        total = 0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                nm = md[ev.metadata_id].name
                agg[nm][0] += ev.duration_ps
                agg[nm][1] += 1
                total += ev.duration_ps
        if not agg:
            continue
        print(f"\n== plane: {plane.name} | lines: {[l.name for l in plane.lines]}")
        print(f"device busy {total/1e12*1e3:.2f} ms over wall {dt*1e3:.0f} ms "
              f"-> {total/1e12/n*1e3:.3f} ms/tok busy")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        print(f"{'op':64s} {'ms/tok':>8s} {'count/tok':>10s} {'us/call':>8s}")
        groups = collections.defaultdict(lambda: [0, 0])
        for nm, (ps, c) in rows:
            base = re.sub(r"[.\d]+$", "", nm)
            groups[base][0] += ps
            groups[base][1] += c
        for nm, (ps, c) in sorted(groups.items(), key=lambda kv: -kv[1][0])[:40]:
            print(f"{nm[:64]:64s} {ps/1e12/n*1e3:8.3f} {c/n:10.1f} "
                  f"{ps/1e6/c:8.1f}")


if __name__ == "__main__":
    main()
