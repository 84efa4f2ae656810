#!/bin/sh
# Rebuild of /root/reference/scripts/cifar/vgg.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset cifar100-whitened \
-nDonkeys 4 \
-nEpochs 200 \
-epochSize 300 \
-batchSize 128 \
-imageSize 36 \
-imageCrop 32 \
-colorspace bgr \
-netType cifar/vgg \
-nLayer 4 \
-nEpochsSave 60 \
-train -test "$@"
