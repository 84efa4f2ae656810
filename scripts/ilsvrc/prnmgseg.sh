#!/bin/sh
# Rebuild of /root/reference/scripts/ilsvrc/prnmgseg.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset ilsvrc \
-nDonkeys 10 \
-nEpochs 200 \
-epochSize 10000 \
-batchSize 16 \
-iterSize 16 \
-netType ilsvrc/prnmgseg \
-depth 30 \
-nGPU 4 \
-shortcutType A \
-train -test "$@"
