#!/bin/bash
# Round-5 chip queue #2: decode B-scaling with layered-born caches
# (the split-transient OOM fix) + a full bench rehearsal.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*" ; }

log "4b. SR cost check: murmur-hash SR (default) vs SR off at 774M"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 2>&1 | grep -E "wall" | head -2
KOIFISH_SR=off timeout 2400 python -c "
import sys
sys.argv = ['prof_step.py', '--model', '774m', '--batch', '16', '--int8',
            '--fce', '--mdt', 'bf16']
import jax
# patch: run with stochastic_round=False via TrainCard default override
import koifish_tpu.config as cfg
cfg.TrainCard.stochastic_round = False
exec(open('prof_step.py').read())
" 2>&1 | grep -E "wall" | head -2

log "5. decode B sweep with layered-born caches (B=64 rerun, B=128 retry)"
for b in 64 128; do
  log "  decode B=$b"
  timeout 2400 python -u bench.py --mode decode --batch $b --steps 64 2>&1 | tail -3
done

log "6. full bench rehearsal (BENCH_r05 preview)"
timeout 3600 python -u bench.py 2>&1 | tail -6

log "queue2 done"

log "7. retry of the compile-killed runs (qdgrad pair + remat=dots)"
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --dgrad tile 2>&1 | tail -25
timeout 2400 python -u prof_step.py --model 774m --batch 16 --int8 --fce \
  --mdt bf16 --remat dots 2>&1 | tail -4
log "queue2 really done"
