"""Direct XPlane parser — ground-truth device timings through the axon
tunnel (host-side timers and even ``block_until_ready`` are unreliable
there; see BASELINE.md "Measurement note").

The tensorboard_plugin_profile CSV converter cannot load in this image (its
generated protos predate the installed protobuf's generated-code check), so
this parses ``tensorflow.tsl.profiler.protobuf.xplane_pb2`` directly:
TPU device planes -> XLA op lines -> per-op self-time sums.

Usage:
    python benchmarks/xplane_parse.py <trace.xplane.pb> [top_n]
or  from benchmarks.xplane_parse import op_times, device_total
"""

from __future__ import annotations

import sys
from collections import defaultdict


def _load(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    return space


def device_planes(space):
    return [p for p in space.planes if "TPU" in p.name and "Host" not in p.name]


def op_times(path: str):
    """{op_name: total_self_time_us} summed over TPU device planes' XLA op
    lines, plus the wall span (last end - first start) per plane."""
    space = _load(path)
    sums: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    span_us = 0.0
    for plane in device_planes(space):
        meta = plane.event_metadata
        for line in plane.lines:
            # 'XLA Ops' is the EXCLUSIVE serial op timeline (it sums to the
            # module span); 'Async XLA Ops' double-counts overlapped
            # transfers and 'XLA Modules' is the whole-program envelope
            if line.name == "XLA Modules":
                span_us = max(
                    span_us, max((e.duration_ps / 1e6 for e in line.events), default=0)
                )
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
                sums[name] += ev.duration_ps / 1e6  # ps -> us
                counts[name] += 1
    return dict(sums), dict(counts), span_us


def main(path: str, top_n: int = 30):
    sums, counts, span_us = op_times(path)
    total = sum(sums.values())
    print(f"device planes total op time: {total/1e3:.2f} ms; span {span_us/1e3:.2f} ms")
    for name, t in sorted(sums.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{t:12.1f} us {counts[name]:>6}x  {name[:110]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
