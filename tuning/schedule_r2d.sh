# Targeted deep-trapezoid pass on the 0.77-region (fu6_tm256_ch16 hit
# 0.7718 ms/step = 0.849 of roofline), then the remainder of schedule C.
cd /root/repo
T="python -m drstencil_tpu.tune.tuner"
$T benchmarks/2d25pt_box.stc --out-dir tuning --budget 2000 --pairs 8 \
   --filter 'stream_fu[468]_tm[234]*_ch?[246]_trap_roll'
$T benchmarks/2d9pt_star.stc  --out-dir tuning --budget 1500 --pairs 8 \
   --filter 'stream_fu[234]_tm*_ch*_trap_*'
$T benchmarks/2d9pt_star.stc  --out-dir tuning --budget 600 --pairs 8
$T benchmarks/2d9pt_cross.stc --out-dir tuning --budget 1200 --pairs 8 \
   --filter 'stream_fu[234]_tm*_ch*_trap_*'
$T benchmarks/2d9pt_cross.stc --out-dir tuning --budget 600 --pairs 8
for s in 2d5pt_star 2d5pt_cross 2d9pt_box; do
  $T benchmarks/$s.stc --out-dir tuning --budget 600 --pairs 8
done
for s in 3d7pt_star 3d9pt_cross; do
  $T benchmarks/$s.stc --out-dir tuning --budget 900 --pairs 8
done
python -c "
from drstencil_tpu.tune.session import aggregate_metrics
from drstencil_tpu.tune.tuned import reconcile_from_ledgers
aggregate_metrics('tuning')
print(reconcile_from_ledgers('tuning'))"
echo SCHEDULE_D_DONE
