#!/usr/bin/env python3
"""Trigger-frame / ATE parity harness against the C++ reference.

BASELINE.json's contract requires relocalization (fr2_360_kidnap) and loop
closure (fr1_room) to TRIGGER AT THE SAME FRAMES as the reference
(/root/reference/test/vo_run.cpp prints per-frame state; loopClosing.cpp:
353-355 prints loop detections). This tool compares two run-events JSON
files — ours produced by `python -m vo_slam_test_tpu.run_slam ...
--events-out ours.json`, the reference side transcribed from a vo_run log
with `--from-log` — and fails when triggers diverge beyond tolerance.

Reference events JSON schema (hand-written or via --from-log):
  {"reloc_frames": [int, ...], "loop_frames": [int, ...],
   "ate_rmse_m": float|null}

Usage:
  python tools/parity_check.py ours.json reference.json \
      [--frame-tol 2] [--ate-factor 1.3]
  python tools/parity_check.py --from-log vo_run.log reference.json
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def parse_vo_run_log(path: str) -> dict:
    """Extract trigger frames from a reference vo_run console log.

    The reference prints "current frame id: N" per frame
    (visualOdometry.cpp), "relocalization succeed!" on recovery
    (visualOdometry.cpp:391-394 region), and "loop detected!" /
    "loop closing over" around correctLoop (loopClosing.cpp:353-355,489).
    """
    reloc, loops = [], []
    frame = -1
    with open(path) as f:
        for line in f:
            m = re.search(r"(?:current frame|frame)\s*(?:id)?\s*[:#]?\s*(\d+)", line, re.I)
            if m:
                frame = int(m.group(1))
            if re.search(r"relocali[sz]", line, re.I) and re.search(
                r"succe|recover", line, re.I
            ):
                reloc.append(frame)
            if re.search(r"loop (?:closing over|closed|detected)", line, re.I):
                loops.append(frame)
    return {"reloc_frames": reloc, "loop_frames": loops, "ate_rmse_m": None}


def match_triggers(ours: list, ref: list, tol: int) -> list:
    """Greedy one-to-one matching of trigger frames within +-tol."""
    ref_left = list(ref)
    failures = []
    for f in ours:
        best = None
        for r in ref_left:
            if abs(r - f) <= tol and (best is None or abs(r - f) < abs(best - f)):
                best = r
        if best is None:
            failures.append(("extra", f))
        else:
            ref_left.remove(best)
    for r in ref_left:
        failures.append(("missing", r))
    return failures


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ours", help="our run events JSON (run_slam --events-out)")
    ap.add_argument("reference", help="reference events JSON")
    ap.add_argument("--from-log", action="store_true",
                    help="treat OURS as a raw reference vo_run log and just "
                         "convert it to events JSON at REFERENCE")
    ap.add_argument("--frame-tol", type=int, default=2,
                    help="allowed trigger-frame offset (default 2)")
    ap.add_argument("--ate-factor", type=float, default=1.3,
                    help="max ours/reference ATE ratio (default 1.3)")
    args = ap.parse_args(argv)

    if args.from_log:
        events = parse_vo_run_log(args.ours)
        with open(args.reference, "w") as f:
            json.dump(events, f, indent=2)
        print(f"wrote {args.reference}: {events}")
        return 0

    with open(args.ours) as f:
        ours = json.load(f)
    with open(args.reference) as f:
        ref = json.load(f)

    ok = True
    for kind in ("reloc_frames", "loop_frames"):
        fails = match_triggers(ours.get(kind, []), ref.get(kind, []), args.frame_tol)
        label = kind.replace("_frames", "")
        if fails:
            ok = False
            for what, frame in fails:
                print(f"FAIL {label}: {what} trigger at frame {frame} "
                      f"(tol ±{args.frame_tol})")
        else:
            print(f"OK   {label}: {len(ours.get(kind, []))} trigger(s) match "
                  f"{ref.get(kind, [])}")

    ours_ate, ref_ate = ours.get("ate_rmse_m"), ref.get("ate_rmse_m")
    if ours_ate is not None and ref_ate:
        ratio = ours_ate / ref_ate
        if ratio > args.ate_factor:
            ok = False
            print(f"FAIL ate: ours {ours_ate:.4f} m vs reference {ref_ate:.4f} m "
                  f"(ratio {ratio:.2f} > {args.ate_factor})")
        else:
            print(f"OK   ate: ours {ours_ate:.4f} m vs reference {ref_ate:.4f} m "
                  f"(ratio {ratio:.2f})")
    else:
        print("SKIP ate: missing on one side")

    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
