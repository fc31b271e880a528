#!/bin/bash
# Round-4 end-of-training runbook: run AFTER the r4s supervisor exits
# (train.log ends with "done at step") or after stopping the run at a
# keep-best point. Each stage writes its artifact and is safe to re-run.
# Assumes the TPU is otherwise free.
set -x
cd "$(dirname "$0")/.."
# default to the fine-tune run; override with OPT=... for the from-scratch run
OPT=${OPT:-configs/train_synthetic_r4s_ft.yml}

# 0. persist the best weights INSIDE git (the mid-round VM re-provision
#    wiped runs/ including every checkpoint of rounds 2-4a; never again)
python tools/export_torch_checkpoint.py -opt $OPT --best \
    --out weights/trained_best_G.pth

# 1. quality: keep-best eval, reference protocol + scale sweep + x16 + wide
python scripts/eval_model.py -opt $OPT --best \
    --scale-sweep 2,3,8 --x16 --wide --out EVAL_r04.json

# 2. bf16 gate on the same weights (mandate: <=0.01 dB delta to default bench mode)
python scripts/eval_model.py -opt $OPT --best \
    --gather-dtype bf16 --mlp-dtype bf16 --scale-sweep "" \
    --out EVAL_r04_bf16.json

# 2b. x8 geometric self-ensemble (separate, clearly-labeled protocol row)
python scripts/eval_model.py -opt $OPT --best --self-ensemble \
    --scale-sweep "" --out EVAL_r04_ens.json

# 2c. decoding_localensemble — reference-native decode mode
#     (Sakuya_arch_test.py:962-1085); CPU probe of the step-3000 weights
#     measured +0.18 dB t0 / +0.17 dB t0.5 over plain decoding
python scripts/eval_model.py -opt $OPT --best --local-ensemble \
    --scale-sweep "" --out EVAL_r04_le.json

# 3. perf: profile (flat-gather encode attribution) + microbench refresh
python tools/profile_bench.py --out PROFILE_r04.json --trace-dir runs/profile/r4
python tools/gather_decompose.py > GATHER_DECOMPOSE_r04.jsonl
python tools/gather_bench.py > GATHER_BENCH_r04.json
python tools/decode_decompose.py > DECODE_DECOMPOSE_r04.jsonl

# 4. headline bench: B=1 + the B=2 batched trial (VERDICT item 5)
BENCH_PAIR_BATCH=2 python bench.py | tee BENCH_TRIAL_r04.json

# 5. multichip dryrun (flagship train step now included)
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
