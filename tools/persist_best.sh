#!/bin/bash
# Export the current keep-best weights into git and commit — insurance
# against environment loss (a VM re-provision wiped all of runs/ once).
# Safe to run while the trainer is live (reads the best.json snapshot).
set -e
cd "$(dirname "$0")/.."
OPT=${1:-configs/train_synthetic_r4s.yml}
python tools/export_torch_checkpoint.py -opt "$OPT" --best \
    --out weights/trained_best_G.pth --platform cpu
MODELS=$(python -c "import yaml,sys; print(yaml.safe_load(open('$OPT'))['path']['models'])")
cp "$MODELS/val_curve.jsonl" weights/val_curve.jsonl 2>/dev/null || true
cp "$MODELS/best.json" weights/best.json 2>/dev/null || true
git add weights/
git commit -q -m "weights: persist current keep-best generator (mid-run snapshot)" || true
git log --oneline -1
