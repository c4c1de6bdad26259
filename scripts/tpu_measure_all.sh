#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 #2): run everything at round
# START, one process at a time (cross-process numbers are not
# decision-grade), logging to runs/tpu_r5/.
#
#   bash scripts/tpu_measure_all.sh [stage...]   # default: all stages
#
# Stages: probe bench deform_rvrt deform_vrt video train profile converge
set -u
cd "$(dirname "$0")/.."
OUT=${TPU_MEASURE_OUT:-runs/tpu_r5}
mkdir -p "$OUT"

STAGES=${*:-probe bench deform_rvrt deform_vrt video train profile converge}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s) ==="
  ( timeout "$to" "$@" > "$OUT/$name.log" 2> "$OUT/$name.err"
    echo "rc=$?" >> "$OUT/$name.log" )
  tail -5 "$OUT/$name.log"
}

for s in $STAGES; do
  case $s in
    probe)
      # stage 0 (VERDICT r4 weak #7): catch Mosaic lowering failures in
      # minutes, not inside a 20-min full-model compile
      run probe_mosaic 1200 python scripts/probe_mosaic.py ;;
    bench)
      # headline: target >= 2.2 MP/s into the driver-visible record
      run bench 3600 python bench.py ;;
    deform_rvrt)
      # gather vs mxu vs fused, interleaved in ONE process (rvrt GDA)
      run deform_rvrt 5400 python -m kair_tpu.cli.video_bench \
          --net rvrt --frames 6 --size 64 --fuse --compare ;;
    deform_vrt)
      # gather vs mxu vs fused (vrt DCN)
      run deform_vrt 5400 python -m kair_tpu.cli.video_bench \
          --net vrt --frames 6 --size 64 --fuse --compare ;;
    video)
      # headline video numbers with the winning deform path: re-run after
      # inspecting deform_*.log and flip --deform accordingly
      run video_rvrt 3600 python -m kair_tpu.cli.video_bench \
          --net rvrt --frames 6 --size 64 --fuse --deform fused
      run video_vrt 3600 python -m kair_tpu.cli.video_bench \
          --net vrt --frames 6 --size 64 --fuse --deform fused ;;
    train)
      # VRT fused-training step (batch 8: 64 OOMs, round-3 note)
      run train_vrt_fuse 5400 python -m kair_tpu.cli.train_bench \
          --net vrt --batch 8 --patch 64 --fuse
      run train_vrt_xla 5400 python -m kair_tpu.cli.train_bench \
          --net vrt --batch 8 --patch 64
      run train_swinir 3600 python -m kair_tpu.cli.train_bench \
          --net swinir --batch 16 --patch 64 --fuse ;;
    profile)
      # MFU attribution for the >=30% target
      run bench_profile 3600 python bench.py --profile "$OUT/trace" ;;
    converge)
      # DnCNN from-scratch convergence vs released dncnn_25
      [ -d runs/convergence/trainH ] || \
        python scripts/prep_convergence_data.py --out runs/convergence
      run converge 14400 python scripts/train_dncnn_convergence.py \
          --steps 50000 --dtype f32 ;;
  esac
done

echo "=== summary ==="
grep -h '"metric"\|rc=' "$OUT"/*.log 2>/dev/null | head -40
