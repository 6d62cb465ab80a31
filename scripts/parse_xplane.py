"""Aggregate per-op device self-times from a jax.profiler xplane trace.

Usage: python scripts/parse_xplane.py /tmp/flagship_trace [top_n]
Works without the (broken-here) tensorboard_plugin_profile converter by
reading the XPlane proto directly (tensorflow.tsl.profiler.protobuf).
"""
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane files under", root)
        return 1
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())
    print("planes:", [p.name for p in space.planes])
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        totals = collections.Counter()
        counts = collections.Counter()
        long_name = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                name = md.name
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
                for st in list(ev.stats) + list(md.stats):
                    sm = stat_meta[st.metadata_id].name
                    if sm in ("hlo_op", "long_name", "tf_op"):
                        if st.ref_value:
                            long_name[name] = stat_meta[st.ref_value].name
                        elif st.bytes_value:
                            long_name[name] = st.bytes_value.decode("utf-8", "ignore")
                        elif st.str_value:
                            long_name[name] = st.str_value
        if not totals:
            # fall back: print line names to see what's available
            print(f"plane {plane.name}: lines = {[l.name for l in plane.lines]}")
            continue
        total_ms = sum(totals.values())
        print(f"\n=== plane {plane.name}: total op time {total_ms:.1f} ms "
              f"(across trace) ===")
        for name, ms in totals.most_common(top_n):
            print(f"{ms:8.2f} ms  x{counts[name]:<4d} {ms/total_ms*100:5.1f}%  "
                  f"{name[:100]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
