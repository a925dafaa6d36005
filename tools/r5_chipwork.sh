#!/bin/bash
# Round-5 on-chip work queue — run in ONE background process so a tunnel
# flake doesn't strand individual jobs. Each job has its own generous
# timeout (never killed mid-RPC by the harness). Log: /tmp/r5_chipwork.log
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*" ; }

log "0. chip probe"
timeout 600 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16); print('alive', float((x@x).sum()))" \
  || { log "chip dead — aborting queue"; exit 1; }

log "1. kernel_smoke --quick (new kernels: codebook LUT, wide-E fused CE)"
timeout 3000 python -u tools/kernel_smoke.py --quick

log "2. flash QS sweep at 774M (remaining r4 item)"
for qs in 128 256 512; do
  log "  QS=$qs"
  KOIFISH_FLASH_QS=$qs timeout 2400 python -u prof_step.py \
    --model 774m --batch 16 --int8 --fce --mdt bf16 2>&1 | grep -E "wall|QS" | head -3
done

log "3. qdgrad tile on/off at 774M (xprof attribution)"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --dgrad off 2>&1 | tail -30
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --dgrad tile 2>&1 | tail -30

log "4. remat=dots at 774m (the r4 HTTP-500 diagnosis)"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --remat dots 2>&1 | tail -5

log "queue done"
