#!/usr/bin/env bash
# Download and unpack UCF101 + official train/test splits
# (port of reference create_ucf_dataset.sh:1-20).
set -euo pipefail

DEST="${1:-./data/UCF101}"
mkdir -p "$DEST"
cd "$DEST"

echo "Downloading UCF101 (6.5GB) and split lists..."
curl -L -O --retry 3 https://www.crcv.ucf.edu/data/UCF101/UCF101.rar \
    || wget --no-check-certificate https://www.crcv.ucf.edu/data/UCF101/UCF101.rar
curl -L -O --retry 3 \
    https://www.crcv.ucf.edu/data/UCF101/UCF101TrainTestSplits-RecognitionTask.zip \
    || wget --no-check-certificate \
    https://www.crcv.ucf.edu/data/UCF101/UCF101TrainTestSplits-RecognitionTask.zip

echo "Unpacking..."
if command -v unrar >/dev/null; then unrar x -o+ UCF101.rar
elif command -v 7z >/dev/null; then 7z x -y UCF101.rar
else echo "need unrar or 7z to extract UCF101.rar" >&2; exit 1; fi
unzip -o UCF101TrainTestSplits-RecognitionTask.zip

echo "Splitting into train/ and val/ by the official fold lists..."
python "$(dirname "$0")/ucf_split_train_test.py" \
    --videos UCF-101 --splits ucfTrainTestlist --out .
echo "Done: $DEST/{train,val}/<ClassName>/*.avi"
