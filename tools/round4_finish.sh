#!/bin/bash
# Round-4 end-of-training runbook: run AFTER the ft2 supervisor exits
# (train.log ends with "done at step") or after stopping the run at a
# keep-best point. Each stage writes its artifact and is safe to re-run.
# Assumes the TPU is otherwise free.
#
# Weight selection: $OPT's keep-best IF its best.json dev score beats the
# warm start (61.2823, weights/val_curve.jsonl step 3000); otherwise the
# in-git warm start weights/trained_best_G.pth.
# tools/persist_best.sh re-exports the winner into git first.
#
# NOTE: network_G must match the adopted weights (rgb_skip variant), so the
# adoption gate ALSO selects which config the evals below build from:
# CAND (this session's training run) if its keep-best wins, else FALLBACK
# (plain rgb_skip, matching the in-git warm-start weights).
set -x
cd "$(dirname "$0")/.."
# (bic8's batch-8 GT-192 train step RESOURCE_EXHAUSTEDs the single v5e —
# session 4 fell back to the proven batch-4 adaptation recipe)
CAND=${CAND:-configs/train_synthetic_r4s_bic.yml}
FALLBACK=${FALLBACK:-configs/train_synthetic_r4s_ft2.yml}
PTH=weights/trained_best_G.pth

# 0. adoption gate + persist the best weights INSIDE git (a VM re-provision
#    wiped runs/ including every checkpoint of rounds 2-4a; never again).
#    persist_best refuses nothing — gate on the dev score before running it:
BEST=$(python -c "import yaml; print(yaml.safe_load(open('$CAND'))['path']['models'])")/best.json
if [ -f "$BEST" ] && python - "$BEST" <<'EOF'
import json, sys
best = json.load(open(sys.argv[1]))
sys.exit(0 if best["score"] > 61.2823 and best["step"] > 0 else 1)
EOF
then
  OPT=$CAND
  bash tools/persist_best.sh "$OPT"
else
  OPT=$FALLBACK
fi

# 1. quality: reference protocol + scale sweep + x16 + wide families
python scripts/eval_model.py -opt $OPT --pth $PTH \
    --scale-sweep 2,3,8 --x16 --wide --out EVAL_r04_plain.json

# 2. bf16 gate on the same weights (mandate: <=0.01 dB delta)
python scripts/eval_model.py -opt $OPT --pth $PTH \
    --gather-dtype bf16 --mlp-dtype bf16 --scale-sweep "" \
    --out EVAL_r04_bf16.json

# 2b. reference-native decoding_localensemble (Sakuya_arch_test.py:962-1085)
python scripts/eval_model.py -opt $OPT --pth $PTH --local-ensemble \
    --scale-sweep "" --out EVAL_r04_le.json

# 2c. localensemble + x8 geometric self-ensemble (beyond-parity row; the
#     pre-ft2 probe of this mode is EVAL_r04_le_se.json: t0 36.027)
python scripts/eval_model.py -opt $OPT --pth $PTH --local-ensemble \
    --self-ensemble --scale-sweep "" --out EVAL_r04_le_se.json

# 2d. merge the per-mode runs into the single mandate artifact
python tools/aggregate_eval.py --plain EVAL_r04_plain.json \
    --bf16 EVAL_r04_bf16.json --le EVAL_r04_le.json \
    --le-se EVAL_r04_le_se.json --out EVAL_r04.json

# 3. perf microbench refresh. (PROFILE_r04.json, DECODE_DECOMPOSE_r04.jsonl
#    and BENCH_TRIAL_r04.json were all landed uncontended earlier in the
#    round — commits 7d8c046, d676789 — so those stages are dropped here.)
python tools/gather_decompose.py > GATHER_DECOMPOSE_r04.jsonl
python tools/gather_bench.py > GATHER_BENCH_r04.json

# 5. multichip dryrun (flagship train step included)
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# 6. commit the round's evidence (the driver would sweep uncommitted work,
#    but artifacts this important should land deliberately)
git add EVAL_r04*.json GATHER_BENCH_r04.json \
    GATHER_DECOMPOSE_r04.jsonl 2>/dev/null
git commit -q -m "artifacts: round-4 quality + perf evidence (finish runbook)" || true
