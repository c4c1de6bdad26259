#!/bin/bash
# Round-5 recovery queue (the machine restart killed tpu_queue4.sh): waits
# for the in-flight bench.py validation of the new fused conv tail kernel,
# then runs every remaining evidence producer, short stages first so a
# second interruption still leaves the round with complete small evidence:
#   1. bench_profile   — trace-attributed headline (tail-kernel check)
#   2. profile_rvrt    — <110 ms/clip attribution trace (VERDICT r4 #6)
#   3. loader_ab       — native C++ vs python loader it/s (VERDICT r4 #7)
#   4. train_swinir    — SwinIR train-step row
#   5. train_vrt_*     — batch-8 fused/xla VRT train step w/ remat,
#                        falling back 8→4→2 (r4 weak #4)
#   6. converge_v2     — DnCNN BN-form 100k steps (auto-resumes; on
#                        timeout an --eval_only pass still writes a report)
set -u
cd "$(dirname "$0")/.."
OUT=runs/tpu_r5
mkdir -p "$OUT"

# wait for the running headline bench to release the chip
for i in $(seq 1 120); do
  grep -q '^rc=' "$OUT/bench.log" 2>/dev/null && break
  sleep 30
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s) ==="
  ( timeout "$to" "$@" > "$OUT/$name.log" 2> "$OUT/$name.err"
    echo "rc=$?" >> "$OUT/$name.log" )
  tail -3 "$OUT/$name.log"
}

run bench_profile 3600 python bench.py --profile "$OUT/trace"
run profile_rvrt 3600 python -m kair_tpu.cli.video_bench \
    --net rvrt --frames 6 --size 64 --fuse --deform fused \
    --profile "$OUT/trace_rvrt"
run loader_ab 5400 python scripts/loader_ab.py
run train_swinir 3600 python -m kair_tpu.cli.train_bench \
    --net swinir --batch 16 --patch 64 --fuse

# both non-remat legs OOMed in round 5's first pass (fused 43.9G, plain-XLA
# 209.3G vs 15.75G hbm) — remat, with batch fallback; the reference recipe
# is batch 8 over 8 GPUs = 1 clip/device, so any of these is a fair
# per-chip number (the log records which batch succeeded)
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

run converge_v2 14400 python scripts/train_dncnn_convergence.py \
    --steps 100000 --dtype f32 --act_mode BR --root runs/convergence_v2
if ! grep -q '"gap_db"' runs/convergence_v2/report.json 2>/dev/null; then
  run converge_v2_eval 1800 python scripts/train_dncnn_convergence.py \
      --eval_only --act_mode BR --root runs/convergence_v2 \
      --schedule_steps 100000
fi

echo "=== queue5 summary ==="
grep -h '"metric"\|rc=\|dB' "$OUT"/*.log 2>/dev/null | tail -40
