#!/bin/sh
# Rebuild of /root/reference/scripts/mnist-cluttered/unmg.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset mnist-seg \
-nDonkeys 4 \
-nEpochs 200 \
-epochSize 150 \
-batchSize 64 \
-colorspace bgr \
-netType mnist-cluttered/unmg \
-nEpochsSave 60 \
-train -test "$@"
