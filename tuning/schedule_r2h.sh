# Bonus 3D pass with the round-2 space (ch=tm/2,tm/4 slabs + denser tm),
# then honest 3D winner selection.  Margins are already >1.25; this is
# upside-only.
cd /root/repo
T="python -m drstencil_tpu.tune.tuner"
$T benchmarks/3d7pt_star.stc  --out-dir tuning --budget 1300 --pairs 8 \
   --filter 'stream_fu[234]_tm*trap*'
$T benchmarks/3d9pt_cross.stc --out-dir tuning --budget 1100 --pairs 8 \
   --filter 'stream_fu[234]_tm*trap*'
python -m drstencil_tpu.tune.finalists --out-dir tuning --reps 3 \
   --stencils 3d7pt_star,3d9pt_cross
python -c "
from drstencil_tpu.tune.session import aggregate_metrics
aggregate_metrics('tuning')"
echo SCHEDULE_H_DONE
