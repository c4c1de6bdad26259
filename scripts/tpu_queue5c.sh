#!/bin/bash
# Round-5 queue, part c: a second machine restart killed queue5b mid
# bench_profile (its first leg had also raced the carry-dtype fix
# e7f213c). Convergence training data was wiped with it and has been
# re-prepped (scripts/prep_convergence_data.py). Re-run everything that
# still has no rc=0 log, short stages first, converge_v2 last with the
# remaining wall clock (it auto-resumes and has an --eval_only fallback).
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

run bench_profile 3600 python bench.py --profile "$OUT/trace"
run train_swinir 1800 python -m kair_tpu.cli.train_bench \
    --net swinir --batch 16 --patch 64 --fuse
run loader_ab 3600 python scripts/loader_ab.py

# both non-remat legs OOMed in round 5's first pass; remat with batch
# fallback (reference recipe is batch 8 over 8 GPUs = 1 clip/device)
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

run converge_v2 9000 python scripts/train_dncnn_convergence.py \
    --steps 100000 --dtype f32 --act_mode BR --root runs/convergence_v2
if ! grep -q '"gap_db"' runs/convergence_v2/report.json 2>/dev/null; then
  run converge_v2_eval 1800 python scripts/train_dncnn_convergence.py \
      --eval_only --act_mode BR --root runs/convergence_v2 \
      --schedule_steps 100000
fi

echo "=== queue5c summary ==="
grep -h '"metric"\|rc=\|dB' "$OUT"/*.log 2>/dev/null | tail -40
