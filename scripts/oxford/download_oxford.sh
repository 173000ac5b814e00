#!/usr/bin/env bash
# Fetch the 8 Oxford affine covariant sequences used by the reference's
# golden test (testScripts/downloadOxfordDataset.sh.in:4-44). Run on a
# machine with network access; the evaluator (evaluate.py) falls back to
# synthetic homography warps when the dataset is absent.
set -euo pipefail

DEST="${1:-$(dirname "$0")/data}"
BASE="https://www.robots.ox.ac.uk/~vgg/research/affine/det_eval_files"
SEQS=(boat bikes trees graf wall bark leuven ubc)

mkdir -p "$DEST"
for seq in "${SEQS[@]}"; do
    out="$DEST/$seq"
    if [ -d "$out" ]; then
        echo "have $seq"
        continue
    fi
    mkdir -p "$out"
    echo "fetching $seq ..."
    if command -v curl >/dev/null; then
        curl -fsSL "$BASE/$seq.tar.gz" | tar -xz -C "$out"
    elif command -v wget >/dev/null; then
        wget -qO- "$BASE/$seq.tar.gz" | tar -xz -C "$out"
    else
        python3 -c "import sys,urllib.request;\
sys.stdout.buffer.write(urllib.request.urlopen('$BASE/$seq.tar.gz').read())" \
            | tar -xz -C "$out"
    fi
done
echo "done: $DEST"
