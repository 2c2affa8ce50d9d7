"""Aggregate Pallas kernel + sync/real-compute rows from an XPlane trace
captured by profile_decode8b.py. Groups custom-calls by output shape (the
op-name suffix numbering defeats naive grouping) and separates the
synchronous 'XLA Ops' line from async copy spans, whose durations overlap
and must not be summed.

Run: python scripts/agg_trace_qmm.py [trace_dir] [n_tokens]
"""

import collections
import glob
import re
import sys

TRACE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/llamacog_trace_8b"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 256

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = glob.glob(TRACE + "/**/*.xplane.pb", recursive=True)
space = xplane_pb2.XSpace()
with open(paths[0], "rb") as f:
    space.ParseFromString(f.read())

SHAPE = re.compile(r"= ((?:\(?[a-z0-9]+\[[^\]]*\])[^ ]*) ([a-z-]+)")


def key(nm):
    m = SHAPE.search(nm)
    head = nm.split(" ")[0].lstrip("%")
    base = re.sub(r"[.\d]+$", "", head)
    if m:
        return f"{base} {m.group(2)} -> {m.group(1)[:48]}"
    return base


for plane in space.planes:
    if "TPU" not in plane.name:
        continue
    md = plane.event_metadata
    for line in plane.lines:
        if line.name not in ("XLA Ops",):
            continue
        agg = collections.defaultdict(lambda: [0, 0])
        total = 0
        for ev in line.events:
            nm = md[ev.metadata_id].name
            agg[key(nm)][0] += ev.duration_ps
            agg[key(nm)][1] += 1
            total += ev.duration_ps
        print(f"== line '{line.name}': total {total/1e12/N*1e3:.3f} ms/tok")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        print(f"{'op (by out shape)':72s} {'ms/tok':>8s} {'n/tok':>7s} {'us/call':>8s}")
        for nm, (ps, c) in rows[:30]:
            print(f"{nm[:72]:72s} {ps/1e12/N*1e3:8.3f} {c/N:7.1f} {ps/1e6/c:8.1f}")
