#!/bin/sh
# Rebuild of /root/reference/scripts/mnist-cluttered/mnist-saliency.sh — identical flags; set
# DATA_PREFIX to your dataset root (defaults to synthetic data).
python -m mgtpu.main \
-data ${DATA_PREFIX:-synthetic} \
-dataset mnist-saliency \
-nDonkeys 1 \
-nEpochs 1 \
-epochSize 150 \
-batchSize 1 \
-colorspace bgr \
-netType mnist-cluttered/mnist-saliency \
-pipeline saliency \
-nGPU 2 \
-test "$@"
