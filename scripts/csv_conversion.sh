#!/bin/bash
# Drive all 8 CSV conversions (reference data/csv_conversion.sh parity).
set -e
mkdir -p Annots
for ds in bdd10k cityscapes acdc idd; do
  for split in train val; do
    python -m dgod_tpu.data.etl.convert --dataset $ds --image_set $split "$@"
  done
done
