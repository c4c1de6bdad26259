#!/bin/bash
# Round-5 queue, part f: takes over from 5e (parent killed; its in-flight
# VRT batch-4 fused train leg is left to finish). Priority order for the
# remaining chip time:
#   1. deform_{rvrt,vrt}_v2 — one-process gather/mxu/fused A/B with the
#      tap-grouped kernels (469b888, d3789ce). The pre-rework r5 numbers
#      (deform_*.log) no longer describe the committed code, so these
#      re-measurements are what PARITY/README may cite.
#   2. loader_ab_v2 — the fixed (jit-cache-primed, 3a14ba5) native-loader
#      end-to-end A/B; the first run's marginal was garbage.
#   3. converge_v2 — DnCNN with BatchNorm (act_mode BR, the reference
#      recipe) for a COMPLETED 60k-step schedule: a finished schedule at
#      60k beats a 100k schedule cut off before its LR decays.
#   4. train_vrt_xla_remat batch 4 — only if wall clock remains.
set -u
cd "$(dirname "$0")/.."
OUT=runs/tpu_r5
mkdir -p "$OUT"

# wait for the orphaned 5e train leg (batch-4 fused) to release the chip
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  # the dead 5e parent can no longer append its rc line; note completion
  echo "(5e parent killed; leg finished $(date -u +%H:%M:%S), see .err)" \
      >> "$OUT/train_vrt_fuse_remat.log"
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s) $(date -u +%H:%M:%S) ==="
  ( timeout "$to" "$@" > "$OUT/$name.log" 2> "$OUT/$name.err"
    echo "rc=$?" >> "$OUT/$name.log" )
  tail -3 "$OUT/$name.log"
}

run deform_rvrt_v2 3600 python -m kair_tpu.cli.video_bench \
    --net rvrt --frames 6 --size 64 --fuse --compare
run deform_vrt_v2 3600 python -m kair_tpu.cli.video_bench \
    --net vrt --frames 6 --size 64 --fuse --compare

run loader_ab_v2 2700 python scripts/loader_ab.py

run converge_v2 6600 python scripts/train_dncnn_convergence.py \
    --steps 60000 --dtype f32 --act_mode BR --root runs/convergence_v2
if ! grep -q '"gap_db"' runs/convergence_v2/report.json 2>/dev/null; then
  run converge_v2_eval 1200 python scripts/train_dncnn_convergence.py \
      --eval_only --act_mode BR --root runs/convergence_v2 \
      --schedule_steps 60000
fi

run train_vrt_xla_remat 3000 python -m kair_tpu.cli.train_bench \
    --net vrt --batch 4 --patch 64 --remat

echo "=== queue5f summary $(date -u +%H:%M:%S) ==="
grep -h '"metric"\|"gap_db"\|rc=' "$OUT"/*_v2.log "$OUT"/loader_ab_v2.log \
    runs/convergence_v2/report.json 2>/dev/null | tail -20
