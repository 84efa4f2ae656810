#!/bin/sh
# Rebuild of /root/reference/scripts/mnist-cluttered/pnmg.mnist.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset mnist-aff \
-nDonkeys 4 \
-nEpochs 200 \
-epochSize 800 \
-batchSize 64 \
-colorspace bgr \
-netType mnist-cluttered/pnmg.mnist \
-nEpochsSave 60 \
-nGPU 2 \
-train -test "$@"
