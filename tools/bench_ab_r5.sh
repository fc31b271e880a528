#!/bin/bash
# Round-5 stage-C knob bench A/B (run on the idle TPU after training stops,
# AFTER the eval quality gates EVAL_r05_stagec_*.json decide which knobs are
# adoptable): measures the headline workload with each candidate knob stack
# so the bench.py defaults flip is evidence-backed, not hopeful.
#
# Writes one JSON line per configuration to BENCH_AB_r05.jsonl.
# BENCH_PAIR_BATCH=1 for the A/Bs (the batched path's compile retries cost
# ~1 min each and don't change the knob comparison); the final adopted stack
# re-runs with the default PAIR_BATCH for the headline-form number.
set -x
cd "$(dirname "$0")/.."
OUT=BENCH_AB_r05.jsonl
: > "$OUT"

run() {
  local tag=$1; shift
  ( export BENCH_PAIR_BATCH=1 "$@"
    line=$(timeout 1500 python bench.py) || { echo "[ab] $tag FAILED" >&2; return; }
    python - "$tag" "$line" <<'EOF' >> BENCH_AB_r05.jsonl
import json, sys
rec = json.loads(sys.argv[2]); rec["ab_tag"] = sys.argv[1]
print(json.dumps(rec))
EOF
  )
}

run baseline
run dedup          BENCH_STAGEC_DEDUP=1
run dedup_nearest  BENCH_STAGEC_DEDUP=1 BENCH_STAGEC_NEAREST=1
run dedup_fp8      BENCH_STAGEC_DEDUP=1 BENCH_STAGEC_DTYPE=fp8
run full_stack     BENCH_STAGEC_DEDUP=1 BENCH_STAGEC_NEAREST=1 BENCH_STAGEC_DTYPE=fp8

cat "$OUT"
