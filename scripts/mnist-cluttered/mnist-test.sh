#!/bin/sh
# Rebuild of /root/reference/scripts/mnist-cluttered/mnist-test.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset mnist-spt \
-nDonkeys 1 \
-nEpochs 1 \
-epochSize 150 \
-batchSize 64 \
-colorspace bgr \
-netType mnist-cluttered/mnist-test \
-test "$@"
