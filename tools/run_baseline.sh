#!/usr/bin/env bash
# One-command BASELINE verdict: dataset path in, PARITY OK/FAILED out.
#
# Runs the two BASELINE.json trigger scenarios end-to-end and checks
# trigger-frame parity against reference event files:
#   fr1_room        -> loop closure must fire at the reference's frames
#   fr2_360_kidnap  -> relocalization must fire at the reference's frames
#
# Usage:
#   tools/run_baseline.sh <TUM_ROOT> [REF_EVENTS_DIR]
#
#   TUM_ROOT        directory containing rgbd_dataset_freiburg1_room/ and
#                   rgbd_dataset_freiburg2_360_kidnap/ (each with
#                   associate.txt: paired "t rgb t depth" rows)
#   REF_EVENTS_DIR  directory with reference_fr1_room.json and
#                   reference_fr2_kidnap.json (parity_check.py schema;
#                   derive from reference console logs with
#                   `parity_check.py --from-log <log> <out.json>` — see
#                   configs/reference_events.example.json). Defaults to
#                   configs/; missing files skip that comparison with a
#                   warning instead of failing.
#
# Measurement protocol (README.md:16): PROTOCOL_RUNS=5 repeats each
# sequence's measured pass 5 times, drops the min and max, and reports the
# mean of the remaining 3 for tracking ms/frame and ATE RMSE. Default is 1
# (single run; no aggregation) for quick parity checks.
#
# Exit code 0 = every available comparison passed (PARITY OK). The verdict
# line counts skipped sequences/comparisons so it cannot silently overstate
# coverage.
set -u
cd "$(dirname "$0")/.."

TUM_ROOT=${1:?usage: run_baseline.sh <TUM_ROOT> [REF_EVENTS_DIR]}
REF_DIR=${2:-configs}
OUT=${BASELINE_OUT:-/tmp/vo_slam_baseline}
RUNS=${PROTOCOL_RUNS:-1}
mkdir -p "$OUT"

fail=0
skipped=0

run_seq() { # name config_yaml dataset_subdir extra_flags...
    local name=$1 cfg=$2 sub=$3; shift 3
    local ds="$TUM_ROOT/$sub"
    if [ ! -e "$ds/associate.txt" ]; then
        echo "[$name] MISSING $ds/associate.txt — cannot run" >&2
        return 2
    fi
    # rewrite dataset_dir to the provided root
    sed "s#^dataset_dir:.*#dataset_dir: $ds/#" "$cfg" > "$OUT/$name.yaml"
    echo "[$name] running full pipeline..."
    # --reloc-parity: trigger-frame comparisons use the reference's
    # relocalization semantics (all-candidate first-success, always-EPnP)
    python -m vo_slam_test_tpu.run_slam "$OUT/$name.yaml" --slam --reloc-parity "$@" \
        --camera-out "$OUT/$name.camera.txt" \
        --keyframe-out "$OUT/$name.keyframes.txt" \
        --metrics-out "$OUT/$name.metrics.csv" \
        --events-out "$OUT/$name.events.json" || return 1
}

check() { # name ref_json
    local name=$1 ref=$2
    if [ ! -e "$ref" ]; then
        echo "[$name] no reference events at $ref — comparison SKIPPED" >&2
        skipped=$((skipped + 1))
        return 0
    fi
    python tools/parity_check.py "$OUT/$name.events.json" "$ref"
}

# measured_runs name cfg sub extra...: run the measured pass RUNS times
# (run r writes $name.r$r.events.json; run 1 also writes the plain $name
# artifacts used by check()), then aggregate per the README.md:16 protocol.
measured_runs() {
    local name=$1 cfg=$2 sub=$3; shift 3
    run_seq "$name" "$cfg" "$sub" "$@" || return 1
    if [ "$RUNS" -gt 1 ]; then
        cp "$OUT/$name.events.json" "$OUT/$name.r1.events.json"
        local r
        for r in $(seq 2 "$RUNS"); do
            run_seq "$name" "$cfg" "$sub" "$@" || return 1
            cp "$OUT/$name.events.json" "$OUT/$name.r$r.events.json"
        done
        python - "$OUT/$name" "$RUNS" <<'EOF'
import json, sys
base, runs = sys.argv[1], int(sys.argv[2])
evs = [json.load(open(f"{base}.r{r}.events.json")) for r in range(1, runs + 1)]
def protocol(vals):
    """5 runs, drop min & max, mean of the rest (README.md:16)."""
    vals = [v for v in vals if v is not None]
    if len(vals) < 3:
        return (sum(vals) / len(vals)) if vals else None
    vals = sorted(vals)[1:-1]
    return sum(vals) / len(vals)
ms = protocol([e.get("wall_ms_per_frame") for e in evs])
ate = protocol([e.get("ate_rmse_m") for e in evs])
name = base.rsplit("/", 1)[-1]
print(f"[{name}] protocol({runs} runs, drop min/max): "
      f"tracking {ms:.2f} ms/frame" + (f", ATE {ate*100:.2f} cm" if ate else ""))
json.dump({"runs": runs, "wall_ms_per_frame": ms, "ate_rmse_m": ate},
          open(f"{base}.protocol.json", "w"), indent=2)
EOF
    fi
}

# fr1_room: loop-closure triggers. The scene vocabulary is created on the
# first pass (reference protocol: vo_run builds/loads a DBoW vocabulary,
# vo_run.cpp:86-90) then the run is repeated with it loaded.
if run_seq fr1_room_pass1 configs/tum_fr1.yaml \
        rgbd_dataset_freiburg1_room --vocabulary-out "$OUT/fr1_voc.npz"; then
    measured_runs fr1_room configs/tum_fr1.yaml rgbd_dataset_freiburg1_room \
        --vocabulary "$OUT/fr1_voc.npz" || fail=1
    check fr1_room "$REF_DIR/reference_fr1_room.json" || fail=1
else
    fail=1
fi

# fr2_360_kidnap: relocalization triggers
if run_seq fr2_kidnap_pass1 configs/tum_fr2_kidnap.yaml \
        rgbd_dataset_freiburg2_360_kidnap --vocabulary-out "$OUT/fr2_voc.npz"; then
    measured_runs fr2_kidnap configs/tum_fr2_kidnap.yaml \
        rgbd_dataset_freiburg2_360_kidnap --vocabulary "$OUT/fr2_voc.npz" || fail=1
    check fr2_kidnap "$REF_DIR/reference_fr2_kidnap.json" || fail=1
else
    fail=1
fi

# fr3 accuracy scenarios (README.md:19-26): accumulated drift, dynamic
# scene, texture-without-structure. No trigger events to match — these are
# ATE runs; trajectories land in $OUT for external TUM-tool evaluation
# (BASELINE.md protocol via PROTOCOL_RUNS=5). A missing sequence directory
# skips the run with a warning instead of failing — partial datasets still
# produce a verdict on what is present. The freiburg3 camera is the same
# across all three sequences, so one config (configs/tum_fr3.yaml) serves
# them all with the dataset_dir injected per sequence.
fr3_seq() { # name dataset_subdir
    local name=$1 sub=$2
    if [ ! -e "$TUM_ROOT/$sub/associate.txt" ]; then
        echo "[$name] $TUM_ROOT/$sub missing — SKIPPED" >&2
        skipped=$((skipped + 1))
        return 0
    fi
    run_seq "${name}_pass1" configs/tum_fr3.yaml "$sub" \
            --vocabulary-out "$OUT/$name.voc.npz" \
        && measured_runs "$name" configs/tum_fr3.yaml "$sub" \
            --vocabulary "$OUT/$name.voc.npz" \
        && check "$name" "$REF_DIR/reference_$name.json"
}

fr3_seq fr3_long_office rgbd_dataset_freiburg3_long_office_household || fail=1
fr3_seq fr3_sit_halfsph rgbd_dataset_freiburg3_sitting_halfsphere || fail=1
fr3_seq fr3_nstr_tex_near \
    rgbd_dataset_freiburg3_nostructure_texture_near_withloop || fail=1

suffix=""
if [ "$skipped" -gt 0 ]; then
    suffix=" ($skipped skipped)"
fi
if [ "$fail" -eq 0 ]; then
    echo "PARITY OK$suffix (artifacts in $OUT)"
else
    echo "PARITY FAILED$suffix (artifacts in $OUT)" >&2
fi
exit $fail
