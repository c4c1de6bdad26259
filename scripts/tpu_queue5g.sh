#!/bin/bash
# Round-5 queue, part g: the machine restarted before 5f could run; this
# re-runs 5f's stages on the restored checkout. Same priorities:
#   1. deform_{rvrt,vrt}_v2 — gather/mxu/fused A/B with the tap-grouped
#      kernels (469b888, d3789ce). The committed deform_*.log numbers
#      predate the rework; these are what PARITY/README may cite.
#   2. loader_ab_v2 — jit-cache-primed native-loader A/B (3a14ba5).
#   3. converge_v2 — DnCNN-BR (reference recipe) on a COMPLETED 60k
#      schedule; eval_only fallback if the run is cut off.
# prep_convergence_data must run first: runs/ is gitignored, the restart
# wiped trainH/testH (only force-added evidence files survive).
set -u
cd "$(dirname "$0")/.."
OUT=runs/tpu_r5
mkdir -p "$OUT"

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

run prep_data 1200 python scripts/prep_convergence_data.py --out runs/convergence

run loader_ab_v2 2700 python scripts/loader_ab.py

run converge_v2 6600 python scripts/train_dncnn_convergence.py \
    --steps 60000 --dtype f32 --act_mode BR --root runs/convergence_v2
if ! grep -q '"gap_db"' runs/convergence_v2/report.json 2>/dev/null; then
  run converge_v2_eval 1200 python scripts/train_dncnn_convergence.py \
      --eval_only --act_mode BR --root runs/convergence_v2 \
      --schedule_steps 60000
fi

echo "=== queue5g summary $(date -u +%H:%M:%S) ==="
grep -h '"metric"\|"gap_db"\|rc=' "$OUT"/*_v2.log \
    runs/convergence_v2/report.json 2>/dev/null | tail -20
