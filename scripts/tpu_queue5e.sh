#!/bin/bash
# Round-5 queue, part e: reordering of 5c's tail + 5d, after the DCN/GDA
# tap-grouping rework (469b888, d3789ce). Probe the Mosaic compile FIRST
# (minutes) so the VRT train legs never burn a 15-min compile on an
# uncompilable kernel, then the train-step rows, then the one-process
# deform A/Bs at released clip shapes, convergence v2 last with whatever
# wall clock remains (auto-resumes; --eval_only writes a report from the
# latest checkpoint if cut short).
set -u
cd "$(dirname "$0")/.."
OUT=runs/tpu_r5
mkdir -p "$OUT"

# wait for the orphaned loader_ab stage to release the chip
for i in $(seq 1 120); do
  grep -q '^rc=' "$OUT/loader_ab.log" 2>/dev/null && break
  sleep 30
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s) ==="
  ( timeout "$to" "$@" > "$OUT/$name.log" 2> "$OUT/$name.err"
    echo "rc=$?" >> "$OUT/$name.log" )
  tail -3 "$OUT/$name.log"
}

run probe_mosaic_v2 1800 python scripts/probe_mosaic.py
if ! grep -q "PROBE OK" "$OUT/probe_mosaic_v2.log"; then
  echo "PROBE FAILED — tap-grouped kernels do not compile; stopping so" >&2
  echo "the builder can fix or revert before burning train compiles" >&2
  exit 1
fi

train_vrt () {  # $1 tag, $2... extra flags
  local tag=$1; shift
  for b in 8 4 2; do
    echo "=== $tag batch $b ==="
    timeout 3600 python -m kair_tpu.cli.train_bench \
        --net vrt --batch "$b" --patch 64 --remat "$@" \
        > "$OUT/$tag.log" 2> "$OUT/$tag.err"
    rc=$?
    echo "rc=$rc (batch $b)" >> "$OUT/$tag.log"
    tail -3 "$OUT/$tag.log"
    [ "$rc" -eq 0 ] && grep -q '"metric"' "$OUT/$tag.log" && break
  done
}
train_vrt train_vrt_fuse_remat --fuse
train_vrt train_vrt_xla_remat

run deform_rvrt_v2 5400 python -m kair_tpu.cli.video_bench \
    --net rvrt --frames 6 --size 64 --fuse --compare
run deform_vrt_v2 5400 python -m kair_tpu.cli.video_bench \
    --net vrt --frames 6 --size 64 --fuse --compare

run converge_v2 7200 python scripts/train_dncnn_convergence.py \
    --steps 100000 --dtype f32 --act_mode BR --root runs/convergence_v2
if ! grep -q '"gap_db"' runs/convergence_v2/report.json 2>/dev/null; then
  run converge_v2_eval 1800 python scripts/train_dncnn_convergence.py \
      --eval_only --act_mode BR --root runs/convergence_v2 \
      --schedule_steps 100000
fi

echo "=== queue5e summary ==="
grep -h '"metric"\|rc=\|dB' "$OUT"/*.log 2>/dev/null | tail -40
