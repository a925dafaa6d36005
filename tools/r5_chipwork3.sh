#!/bin/bash
# Round-5 chip queue #3 (post-smoke): the last open on-chip diagnostics.
# Serialized in ONE background process; each job has its own generous
# timeout (never kill mid-TPU-RPC). Log: /tmp/r5_chipwork3.log
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*" ; }

log "1. remat=dots at 774M (the r4 HTTP-500 diagnosis; fresh tunnel)"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --remat dots 2>&1 | tail -8

log "2. qdgrad attribution pair at 774M (full xprof top-40 each)"
log "2a. dgrad off"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --dgrad off 2>&1 | tail -45
log "2b. dgrad tile"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --dgrad tile 2>&1 | tail -45

log "3. INT8 decode-GEMV flavor A/B in-step (micro-timings disagree)"
KOIFISH_INT8_GEMV=mxu timeout 2400 python -u tools/decode_int8_ab.py 2>&1 | tail -3
KOIFISH_INT8_GEMV=dot timeout 2400 python -u tools/decode_int8_ab.py 2>&1 | tail -3

log "queue3 done"
