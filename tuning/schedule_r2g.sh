# Final: star fu2 neighborhood on the split-plan kernel, cross fu[34]
# confirmation, then median finalists + BASELINE regeneration.
cd /root/repo
T="python -m drstencil_tpu.tune.tuner"
$T benchmarks/2d9pt_star.stc  --out-dir tuning --budget 1500 --pairs 8 \
   --filter 'stream_fu2_tm*roll'
$T benchmarks/2d9pt_cross.stc --out-dir tuning --budget 900 --pairs 8 \
   --filter 'stream_fu[34]_tm*roll'
python -m drstencil_tpu.tune.finalists --out-dir tuning --top 3 --reps 3
python -c "
from drstencil_tpu.tune.session import aggregate_metrics
aggregate_metrics('tuning')"
python tuning/regen_baseline.py 3
echo SCHEDULE_G_DONE
