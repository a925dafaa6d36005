#!/bin/bash
# Round-5 chip queue #4: qdgrad attribution rerun with the family-
# aggregated prof_step (queue3's tail -45 ate the wall/summary lines),
# plus the 774M B=24 profile (the last un-attributed B-wall).
# Full outputs kept in /tmp/prof_774m_{off,tile,b24}.log.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*" ; }

log "1. 774M dgrad off (full aggregated profile)"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --dgrad off > /tmp/prof_774m_off.log 2>&1
grep -E "wall|device jit" /tmp/prof_774m_off.log

log "2. 774M dgrad tile (full aggregated profile)"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --dgrad tile > /tmp/prof_774m_tile.log 2>&1
grep -E "wall|device jit" /tmp/prof_774m_tile.log

log "3. 774M B=24 (the B-wall attribution)"
timeout 2400 python -u prof_step.py --model 774m --batch 24 --int8 --fce \
  --mdt bf16 > /tmp/prof_774m_b24.log 2>&1
grep -E "wall|device jit" /tmp/prof_774m_b24.log

log "queue4 done"
