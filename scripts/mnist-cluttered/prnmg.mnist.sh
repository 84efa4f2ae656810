#!/bin/sh
# Rebuild of /root/reference/scripts/mnist-cluttered/prnmg.mnist.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset mnist-spt \
-nDonkeys 4 \
-nEpochs 200 \
-epochSize 800 \
-batchSize 32 \
-iterSize 2 \
-colorspace bgr \
-netType mnist-cluttered/prnmg.mnist \
-nEpochsSave 60 \
-nGPU 4 \
-train -test "$@"
