# Star/cross endgame, corrected: ch16 measured counterproductive for
# 2d9pt_star (1.05 vs 0.89) — sweep deep-fu x large-tm with DEFAULT ch
# (3-digit tm labels without a _ch field), then finalists + baseline.
cd /root/repo
T="python -m drstencil_tpu.tune.tuner"
$T benchmarks/2d9pt_star.stc  --out-dir tuning --budget 1500 --pairs 8 \
   --filter 'stream_fu[2346]_tm[1234]??_trap_roll'
$T benchmarks/2d9pt_cross.stc --out-dir tuning --budget 1200 --pairs 8 \
   --filter 'stream_fu[2346]_tm[1234]??_trap_roll'
python -m drstencil_tpu.tune.finalists --out-dir tuning --top 3 --reps 3
python -c "
from drstencil_tpu.tune.session import aggregate_metrics
aggregate_metrics('tuning')"
python tuning/regen_baseline.py 3
echo SCHEDULE_F_DONE
