# Endgame schedule: the at-risk margin stencils get the 25pt recipe
# (deep trapezoid x tm x ch16), then every stencil's winner is selected
# by median re-measurement (finalists), then BASELINE.md regenerates
# from driver-protocol medians.
cd /root/repo
T="python -m drstencil_tpu.tune.tuner"
$T benchmarks/2d9pt_star.stc  --out-dir tuning --budget 1800 --pairs 8 \
   --filter 'stream_fu[2346]_tm*_ch16_trap_roll'
$T benchmarks/2d9pt_cross.stc --out-dir tuning --budget 1500 --pairs 8 \
   --filter 'stream_fu[2346]_tm*_ch16_trap_roll'
python -m drstencil_tpu.tune.finalists --out-dir tuning --top 3 --reps 3
python -c "
from drstencil_tpu.tune.session import aggregate_metrics
aggregate_metrics('tuning')"
python tuning/regen_baseline.py 3
echo SCHEDULE_E_DONE
