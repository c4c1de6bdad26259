#!/bin/bash
# Round-5 queue, part d (run after tpu_queue5c.sh): validate + measure the
# tap-grouped GDA kernel (469b888) on the real chip.
#   1. probe_mosaic — compile + numerics gate for the reworked kernel
#   2. deform_rvrt_v2 — one-process gather/mxu/fused A/B at released
#      RVRT shapes (the r5 pre-rework fused number was 141.3 ms/clip)
set -u
cd "$(dirname "$0")/.."
OUT=runs/tpu_r5
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s) ==="
  ( timeout "$to" "$@" > "$OUT/$name.log" 2> "$OUT/$name.err"
    echo "rc=$?" >> "$OUT/$name.log" )
  tail -3 "$OUT/$name.log"
}

run probe_mosaic_v2 1800 python scripts/probe_mosaic.py
if ! grep -q "PROBE OK" "$OUT/probe_mosaic_v2.log"; then
  echo "probe failed — skipping the A/B" >&2
  exit 1
fi
run deform_rvrt_v2 5400 python -m kair_tpu.cli.video_bench \
    --net rvrt --frames 6 --size 64 --fuse --compare
run deform_vrt_v2 5400 python -m kair_tpu.cli.video_bench \
    --net vrt --frames 6 --size 64 --fuse --compare

echo "=== queue5d summary ==="
grep -h '"metric"\|rc=' "$OUT"/probe_mosaic_v2.log \
    "$OUT"/deform_rvrt_v2.log "$OUT"/deform_vrt_v2.log
