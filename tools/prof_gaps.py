"""Device-timeline gap analysis from an xplane trace.

Answers: when the device is NOT running one of our programs, what is it
waiting on? Prints, for the steady half of the run: busy/idle totals, the
gap histogram by (previous program -> next program), and the largest gaps.

Usage: python tools/prof_gaps.py [trace_dir] [--all]
"""

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pilot_trace"
    paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    assert paths, trace_dir
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())

    events = []  # (start_ps, dur_ps, name)
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        evm = {i: em.name for i, em in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = evm.get(ev.metadata_id, "")
                if name.startswith("jit_"):
                    events.append(
                        (ev.offset_ps, ev.duration_ps, name.split("(")[0]))
    events.sort()
    if not events:
        print("no jit_ events found")
        return
    t0 = events[0][0]
    t1 = events[-1][0] + events[-1][1]
    span = (t1 - t0) / 1e9
    # steady window: second half of the device timeline
    mid = t0 + (t1 - t0) // 2
    win = [e for e in events if e[0] >= mid]
    busy = sum(d for _, d, _ in win) / 1e9
    wspan = (t1 - win[0][0]) / 1e9
    print(f"whole run: {len(events)} events over {span:.0f} ms")
    print(f"steady half: busy {busy:.0f} ms / span {wspan:.0f} ms "
          f"(idle {wspan-busy:.0f} ms, {100*(wspan-busy)/wspan:.0f}%)")

    gaps = collections.Counter()
    gapn = collections.Counter()
    biggest = []
    prev_end, prev_name = None, None
    for s, d, name in win:
        if prev_end is not None and s > prev_end:
            g = (s - prev_end) / 1e9
            key = f"{prev_name} -> {name}"
            gaps[key] += g
            gapn[key] += 1
            biggest.append((g, key))
        prev_end, prev_name = max(prev_end or 0, s + d), name
    print("\ntotal gap ms by transition (steady half):")
    for key, ms in gaps.most_common(12):
        print(f"  {ms:8.1f} ms x{gapn[key]:4d} (avg {ms/gapn[key]:6.2f})  {key}")
    biggest.sort(reverse=True)
    print("\nlargest single gaps:")
    for g, key in biggest[:10]:
        print(f"  {g:8.2f} ms  {key}")


if __name__ == "__main__":
    main()
