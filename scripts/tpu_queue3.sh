#!/bin/bash
# Round-5 follow-on queue: waits for the main measurement queue (queue2) to
# release the chip, then runs the two remaining evidence producers:
#   - loader_ab: native C++ vs python loader it/s on a real train run
#     (VERDICT r4 #7)
#   - converge v2: DnCNN BN-form (act_mode BR) from-scratch run, widened
#     478-tile corpus, 100k steps (v1 gap 0.85 dB; PARITY.md names both
#     causes this run removes)
set -u
cd "$(dirname "$0")/.."
OUT=runs/tpu_r5
mkdir -p "$OUT"

if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== loader_ab ==="
timeout 3600 python scripts/loader_ab.py \
    > "$OUT/loader_ab.log" 2> "$OUT/loader_ab.err"
echo "rc=$?" >> "$OUT/loader_ab.log"
tail -3 "$OUT/loader_ab.log"

echo "=== profile_rvrt ==="
# attribution for the <110 ms/clip target (VERDICT r4 #6): where do the
# 141 ms go at the released 6x64 clip shape?
timeout 3600 python -m kair_tpu.cli.video_bench \
    --net rvrt --frames 6 --size 64 --fuse --deform fused \
    --profile "$OUT/trace_rvrt" \
    > "$OUT/profile_rvrt.log" 2> "$OUT/profile_rvrt.err"
echo "rc=$?" >> "$OUT/profile_rvrt.log"
tail -3 "$OUT/profile_rvrt.log"

echo "=== converge_v2 ==="
timeout 18000 python scripts/train_dncnn_convergence.py \
    --steps 100000 --dtype f32 --act_mode BR --root runs/convergence_v2 \
    > "$OUT/converge_v2.log" 2> "$OUT/converge_v2.err"
echo "rc=$?" >> "$OUT/converge_v2.log"
tail -3 "$OUT/converge_v2.log"
