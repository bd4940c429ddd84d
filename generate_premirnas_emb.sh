#!/usr/bin/env bash
# Analogue of the reference's generate_premirnas_emb.sh
# (/root/reference/generate_premirnas_emb.sh:1): a one-line driver that
# produces per-node embeddings for a pre-miRNA CSV.  Paths are
# parameterized instead of hard-coded; the TPU is the default device so
# there is no --device flag (the reference passes --device cuda).
#
# Usage: ./generate_premirnas_emb.sh INPUT.csv OUTPUT.tsv MODEL.pth [extra flags...]
# (The reference CLI falls back to packaged weights; this repo ships no
# weights file, so the checkpoint is an explicit argument — any
# reference .pth loads directly.)
set -euo pipefail

USAGE="usage: $0 INPUT.csv OUTPUT.tsv MODEL.pth [extra flags...]"
INPUT="${1:?$USAGE}"
OUTPUT="${2:?$USAGE}"
MODEL="${3:?$USAGE}"
shift 3

exec ginfinity-generate-node-embeddings \
    --input "$INPUT" \
    --output "$OUTPUT" \
    --model-path "$MODEL" \
    --id-column Name \
    --num-workers 1 \
    --structure-column-name DotBracket \
    --keep-cols DotBracket \
    "$@"
