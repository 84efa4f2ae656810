#!/bin/sh
# Rebuild of /root/reference/scripts/cifar/prnmg.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset cifar100-whitened \
-nDonkeys 4 \
-nEpochs 200 \
-epochSize 300 \
-batchSize 64 \
-iterSize 2 \
-imageSize 36 \
-imageCrop 32 \
-colorspace bgr \
-netType cifar/prnmg \
-nLayer 1 \
-nGPU 4 \
-nEpochsSave 60 \
-train -test "$@"
