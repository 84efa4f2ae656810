#!/bin/sh
# Rebuild of /root/reference/scripts/ilsvrc/rnmg.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset ilsvrc \
-nDonkeys 10 \
-nEpochs 200 \
-epochSize 10000 \
-batchSize 64 \
-iterSize 4 \
-colorspace bgr \
-netType ilsvrc/rnmg \
-depth 34 \
-nGPU 4 \
-train -test "$@"
