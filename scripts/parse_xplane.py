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

        # Aggregate by model region (from the op_name metadata captured in
        # long_name) and by HLO op category — turns the long overlapped-DMA
        # tail into an actionable per-subsystem split.
        import re as _re

        region_pats = [
            ("attention(pallas)", r"attention_fwd|attention_bwd|flash"),
            ("stem", r"stem_convs|stem_bns"),
            ("vit_blocks", r"blocks_\d|pos_embedding|pos_dropout"),
            ("latent_heads", r"fc_mu|fc_var|to_latent|enc_adapter|dec_adapter|morph"),
            ("decoder_input", r"decoder_input"),
            ("decoder_convs", r"dec_ct_|dec_res_|dec_bns_|dec_out"),
            ("loss", r"vessel_loss|loss"),
            ("optimizer", r"adam|clip_by_global_norm|apply_updates|opt_state"),
        ]
        region_ms = collections.Counter()
        cat_ms = collections.Counter()
        for name, ms in totals.items():
            ln = long_name.get(name, "")
            hay = ln + " " + name
            for region, pat in region_pats:
                if _re.search(pat, hay):
                    region_ms[region] += ms
                    break
            else:
                region_ms["(other)"] += ms
            cat = _re.match(r"%?([a-zA-Z\-_]+)", name)
            cat_ms[cat.group(1).rstrip(".0123456789") if cat else "?"] += ms
        print("\n=== by region ===")
        for r, ms in region_ms.most_common():
            print(f"{ms:8.2f} ms {ms/total_ms*100:5.1f}%  {r}")
        print("\n=== by op category ===")
        for c, ms in cat_ms.most_common(15):
            print(f"{ms:8.2f} ms {ms/total_ms*100:5.1f}%  {c}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
