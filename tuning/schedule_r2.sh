#!/bin/bash
# Round-2 tuning schedule: targeted ch-sweeps on the known-good region
# first, then unfiltered breadth (prior best measured first by the tuner).
cd /root/repo
T="python -m drstencil_tpu.tune.tuner"
for s in 2d9pt_star 2d9pt_cross 2d5pt_star 2d5pt_cross 2d9pt_box; do
  $T benchmarks/$s.stc --out-dir tuning --budget 1500 --pairs 8 \
     --filter 'stream_fu[234]_tm*_ch8_trap_*'
  $T benchmarks/$s.stc --out-dir tuning --budget 1200 --pairs 8
done
for s in 3d7pt_star 3d9pt_cross; do
  $T benchmarks/$s.stc --out-dir tuning --budget 1800 --pairs 8
done
# extra targeted pass on the weakest stencil with whatever is left
$T benchmarks/2d25pt_box.stc --out-dir tuning --budget 1500 --pairs 8 \
   --filter 'stream_fu2_tm*_ch*_trap_*'
python -c "
from drstencil_tpu.tune.session import aggregate_metrics
from drstencil_tpu.tune.tuned import reconcile_from_ledgers
aggregate_metrics('tuning')
print(reconcile_from_ledgers('tuning'))"
