#!/bin/sh
# Rebuild of /root/reference/scripts/mnist-cluttered/unet.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset mnist-sca \
-nDonkeys 4 \
-nEpochs 200 \
-epochSize 800 \
-batchSize 64 \
-colorspace bgr \
-netType mnist-cluttered/unet \
-nEpochsSave 60 \
-train -test "$@"
