"""Parse an XPlane trace dir into a per-op device-time budget.

Aggregates the synchronous "XLA Ops" line of the TPU device plane (async
copy/slice-start DMA events overlap compute and would double-count).

Run: python scripts/parse_xplane.py [trace_dir] [n_tokens]
"""

import collections
import glob
import re
import sys


def main():
    trace = sys.argv[1] if len(sys.argv) > 1 else "/tmp/llamacog_trace_8b"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(trace + "/**/*.xplane.pb", recursive=True)
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.defaultdict(lambda: [0, 0])
            total = 0
            span_lo, span_hi = 1 << 62, 0
            for ev in line.events:
                nm = md[ev.metadata_id].name
                span_lo = min(span_lo, ev.offset_ps)
                span_hi = max(span_hi, ev.offset_ps + ev.duration_ps)
                if nm.startswith("%while"):
                    continue  # outer loop wrapper spans everything
                agg[nm][0] += ev.duration_ps
                agg[nm][1] += 1
                total += ev.duration_ps
            groups = collections.defaultdict(lambda: [0, 0])
            for nm, (ps, c) in agg.items():
                base = re.split(r"[.\d]", nm.split(" = ")[0], 1)[0]
                shp = nm.split(" = ")[1].split("(")[0] if " = " in nm else ""
                key = f"{base} {shp}"[:70]
                groups[key][0] += ps
                groups[key][1] += c
            print(f"== {plane.name} / {line.name}: sum(op) "
                  f"{total/1e12/n*1e3:.3f} ms/tok, span "
                  f"{(span_hi-span_lo)/1e12/n*1e3:.3f} ms/tok")
            print(f"{'op':70s} {'ms/tok':>8s} {'n/tok':>7s} {'us/call':>8s}")
            for nm, (ps, c) in sorted(groups.items(), key=lambda kv: -kv[1][0])[:45]:
                print(f"{nm:70s} {ps/1e12/n*1e3:8.3f} {c/n:7.1f} {ps/1e6/c:8.1f}")


if __name__ == "__main__":
    main()
