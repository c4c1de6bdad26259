#!/bin/bash
# Round-5 queue, part b: the first bench_profile leg raced the carry-dtype
# fix (it imported bench.py before the commit landed) — re-run it, then the
# remaining stages from tpu_queue5.sh.
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

run bench_profile 5400 python bench.py --profile "$OUT/trace"
run loader_ab 5400 python scripts/loader_ab.py
run train_swinir 3600 python -m kair_tpu.cli.train_bench \
    --net swinir --batch 16 --patch 64 --fuse

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

echo "=== queue5b summary ==="
grep -h '"metric"\|rc=\|dB' "$OUT"/*.log 2>/dev/null | tail -40
