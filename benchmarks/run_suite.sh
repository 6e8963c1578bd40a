#!/bin/bash
# Full-suite runner for 1-CPU boxes: sequential chunks, progress to a log.
# Usage: benchmarks/run_suite.sh LOGFILE
cd /root/repo
LOG=${1:-/tmp/suite.log}
: > "$LOG"
CHUNKS=(
  "tests/test_dfsum.py tests/test_eigh3.py tests/test_lie.py tests/test_spline.py tests/test_utils_io.py tests/test_rosbag.py"
  "tests/test_imu.py tests/test_native.py tests/test_window.py tests/test_surfel.py"
  "tests/test_factors.py tests/test_solver.py tests/test_match.py tests/test_pcg_pallas.py"
  "tests/test_pipeline.py tests/test_stream.py tests/test_live_viewer.py tests/test_se3_checkpoint.py"
  "tests/test_regimes.py tests/test_mesh_scaling.py tests/test_graft_entry.py"
  "tests/test_oracle_pipeline.py"
)
rc_all=0
for i in "${!CHUNKS[@]}"; do
  echo "=== chunk $i: ${CHUNKS[$i]}" >> "$LOG"
  python -m pytest ${CHUNKS[$i]} -q 2>&1 | tail -3 >> "$LOG"
  rc=${PIPESTATUS[0]}
  echo "=== chunk $i rc=$rc" >> "$LOG"
  [ "$rc" -ne 0 ] && rc_all=$rc
done
echo "=== DONE rc_all=$rc_all" >> "$LOG"
