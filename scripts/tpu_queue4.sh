#!/bin/bash
# Round-5 follow-on queue v2 (replaces tpu_queue3.sh, reordered so the
# long-pole convergence run starts as soon as the chip frees up):
#   1. converge_v2: DnCNN BN-form (act_mode BR) from-scratch, widened
#      478-tile corpus, 100k steps (v1 gap 0.85 dB; PARITY.md names both
#      causes this run removes) — VERDICT r4 missing #1, highest value
#   2. profile_rvrt: trace at the released 6x64 clip shape for the
#      <110 ms/clip attribution (VERDICT r4 #6)
#   3. loader_ab: native C++ vs python loader it/s (VERDICT r4 #7)
#   4. train_vrt_fuse_remat: the batch-8 fused VRT train step with
#      use_checkpoint_attn remat (the non-remat run OOMed 43.9G vs 15.75G)
#   5. train_vrt_xla_remat: only if the plain-XLA leg produced no metric
set -u
cd "$(dirname "$0")/.."
OUT=runs/tpu_r5
mkdir -p "$OUT"

if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== profile_rvrt ==="
# first: fast (compile-cached from the earlier video_rvrt stage) and it
# unblocks the <110 ms attribution work while converge_v2 holds the chip
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

echo "=== loader_ab ==="
timeout 3600 python scripts/loader_ab.py \
    > "$OUT/loader_ab.log" 2> "$OUT/loader_ab.err"
echo "rc=$?" >> "$OUT/loader_ab.log"
tail -3 "$OUT/loader_ab.log"

# both non-remat legs OOMed at the compile step (fused 43.9G, plain-XLA
# 209.3G vs 15.75G hbm) — re-run with remat, falling back to smaller
# batches if batch 8 still exceeds hbm (the reference recipe is batch 8
# over 8 GPUs = 1 clip per device, so any of these is a fair per-chip
# number; the log records which batch succeeded)
train_vrt () {  # $1 tag, $2... extra flags
  local tag=$1; shift
  for b in 8 4 2; do
    echo "=== $tag batch $b ==="
    timeout 5400 python -m kair_tpu.cli.train_bench \
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

echo "=== queue4 summary ==="
grep -h '"metric"\|rc=\|dB' "$OUT"/converge_v2.log "$OUT"/profile_rvrt.log \
    "$OUT"/loader_ab.log "$OUT"/train_vrt_*.log 2>/dev/null | head -30
