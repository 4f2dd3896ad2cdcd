#!/bin/bash
# Sequential on-chip artifact battery (ONE TPU client at a time — the
# axon tunnel wedges under concurrent clients).  Run when the tunnel is
# healthy; every step appends/merges into its driver-visible artifact.
#
# Usage: bash scripts/run_artifacts.sh [quick|full]
set -u
cd /root/repo
MODE="${1:-full}"
log() { echo "=== [$(date +%H:%M:%S)] $*" >&2; }

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128,128)); print('tpu alive:', float(np.asarray(x@x)[0,0]))" \
    || { log "TPU unreachable — aborting"; exit 2; }
}

probe

log "mul kernel microbench -> MULBENCH.json"
timeout 2400 python experiments/mul_bench.py 512,1024 || log "mul_bench FAILED"

log "oracle checks -> ORACLE_TPU.json"
timeout 3600 python experiments/tpu_oracle_check.py || log "oracle FAILED"

log "MSM scale check -> MSM_TPU.json"
timeout 5400 python experiments/msm_scale_check.py || log "msm_scale FAILED"

if [ "$MODE" = "full" ]; then
  log "NTT sweep + client lifecycle -> NTT_TPU.json (BIG=27)"
  timeout 7200 env BLZ_NTT_SIZES=20,24 BLZ_NTT_BIG=27 \
    python experiments/ntt_tpu_check.py || log "ntt_check FAILED"

  log "pipeline 2^27 -> 2^24 -> PIPELINE_TPU.json"
  timeout 5400 python experiments/pipeline_check.py || log "pipeline FAILED"
else
  log "NTT quick -> NTT_TPU.json (BIG=24)"
  timeout 3600 env BLZ_NTT_SIZES=20 BLZ_NTT_BIG=24 \
    python experiments/ntt_tpu_check.py || log "ntt_check FAILED"
  log "pipeline quick (2^24 -> 2^22)"
  timeout 3600 env BLZ_PIPE_NTT=24 BLZ_PIPE_MSM=22 \
    python experiments/pipeline_check.py || log "pipeline FAILED"
fi

log "profiler trace -> TRACE_MSM.json (per-op device times)"
timeout 2400 python experiments/msm_trace.py 20 || log "trace FAILED"

log "headline bench (all metrics)"
timeout 7200 python bench.py || log "bench FAILED"

log "signed-digit MSM A/B (not recorded)"
timeout 3600 env BLZ_BENCH_ONLY=msm BLZ_MSM_SIGNED=1 python bench.py   || log "signed A/B FAILED"
log "done"
