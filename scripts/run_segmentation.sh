#!/bin/bash
# run_segmentation.sh equivalent (reference: run_segmentation.sh) — loops the bundled
# examples through search + segmentation. Prefer scripts/run_suite.py (one process,
# shared compiled executables); this wrapper exists for CLI familiarity.
set -e
INPUT_ROOT=${1:-/root/reference/data/segmentation/input}
OUT=${2:-./out/segmentation}
for dir in "$INPUT_ROOT"/*/; do
  name=$(basename "$dir")
  [ -f "$dir/gt_img.png" ] || continue
  python -m npp_tpu.cli search --datadir "$dir" --outdir "$OUT/detected"
  python -m npp_tpu.cli segment --datadir "$OUT/detected/$name" --basedir "$OUT/results"
done
