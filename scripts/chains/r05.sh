#!/bin/bash
# Round-5 chain: evals first (the composed full-stack number is the round's
# one job), then training continuations, then re-evals + scale demos.
# Run stages individually: bash scripts/chains/r05.sh <stage>
# TPU training stages run under the stall-watchdog supervisor; eval stages
# log per-frame progress + per-phase timing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
SUP="$PY -m happypose_tpu.scripts.supervise"
DS=local_data/ds_r04
RUNS=local_data/runs_r04
OUT=local_data/runs_r05

case "${1:?stage}" in
# ---------------------------------------------------------------- evals
eval_fullstack_smoke)
  # 8-frame gt-detections smoke: bounds per-frame cost before the real runs
  $PY -m happypose_tpu.scripts.run_eval --split-dir ${DS}_test \
    --models-dir $DS/models --model from-checkpoints \
    --checkpoints $RUNS --detections gt --max-frames 8 \
    --bop19 --vsd-render-size 120 160 \
    --out-dir $OUT/eval_fullstack_smoke
  ;;
eval_fullstack_gt)
  # full 96 held-out frames, gt detections (upper bound w/o detector)
  $PY -m happypose_tpu.scripts.run_eval --split-dir ${DS}_test \
    --models-dir $DS/models --model from-checkpoints \
    --checkpoints ${2:-$RUNS} --detections gt \
    --bop19 --vsd-render-size 120 160 \
    --out-dir ${3:-$OUT/eval_fullstack_gt}
  ;;
eval_fullstack)
  # THE number: trained detector -> 576-grid coarse -> 5-iter refine ->
  # re-score -> BOP19 AR, 96 held-out frames
  $PY -m happypose_tpu.scripts.run_eval --split-dir ${DS}_test \
    --models-dir $DS/models --model from-checkpoints \
    --checkpoints ${2:-$RUNS} --detections detector \
    --detector-run ${3:-$RUNS/detector} --detection-th 0.3 \
    --bop19 --vsd-render-size 120 160 \
    --out-dir ${4:-$OUT/eval_fullstack}
  ;;
eval_coarse)
  $PY -m happypose_tpu.scripts.eval_coarse_checkpoint \
    --coarse-dir ${2:-$RUNS/coarse} --split-dir ${DS}_test \
    --models-dir $DS/models --out ${3:-$OUT/eval_coarse.json}
  ;;
eval_mv)
  $PY -m happypose_tpu.scripts.run_multiview_eval \
    --out-dir $OUT/eval_mv --record-dr 8 --n-views 6 \
    --models-dir $DS/models \
    --checkpoints $RUNS --ba-solver schur
  ;;
eval_det)
  $PY -m happypose_tpu.scripts.run_detection_eval \
    --split-dir ${DS}_test --models-dir $DS/models \
    --detector-run ${2:-$RUNS/detector} \
    --out-dir ${3:-$OUT/eval_det} ${4:+--detection-th $4}
  ;;
# ----------------------------------------------------- training resumes
refiner_resume)
  # continue runs_r04/refiner 650 -> 1400 epochs; 3rd refine iteration
  # joins at epoch 800 (curriculum interval 400, max 3)
  $SUP --watch $RUNS/refiner/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/refiner --model-type refiner --data $DS \
      --models-dir $DS/models --epochs 1400 --epoch-size 512 --batch-size 32 \
      --lr 6e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --eval-every 25 --save-every 20 --resume \
      --add-iteration-epoch-interval 400 --n-iterations-max 3
  ;;
detector_resume)
  # continue runs_r04/detector 120 -> 260 epochs (held-out target >= 0.9)
  $SUP --watch $RUNS/detector/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_detector_training \
      --run-dir $RUNS/detector --split-dir $DS --models-dir $DS/models \
      --epochs 260 --epoch-size 512 --batch-size 16 --lr 1e-4 \
      --image-size 240 320 --save-every 10 --eval-interval 10 --resume
  ;;
coarse_resume)
  # continue runs_r04/coarse 400 -> 700 epochs
  $SUP --watch $RUNS/coarse/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/coarse --model-type coarse --data $DS \
      --models-dir $DS/models --epochs 700 --epoch-size 512 --batch-size 32 \
      --lr 3e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --save-every 20 --resume
  ;;
# ------------------------------------------------------------ scale demo
record20k)
  # ~20k-frame WDS recording for the streaming-at-scale demo (~40 min)
  $PY -m happypose_tpu.scripts.record_synthetic_dataset \
    --models-dir $DS/models --out-dir local_data/ds_r05_20k \
    --n-frames 20480 --seed 5 --wds --wds-only \
    --blur-sigma-max 0 --noise-std-max 0
  ;;
stream_train)
  # refiner short run from the 20k WDS stream; compare step rate vs cached
  $SUP --watch $OUT/stream_probe/log.txt --stall-seconds 600 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $OUT/stream_probe --model-type refiner \
      --data local_data/ds_r05_20k --models-dir $DS/models \
      --stream --epochs 30 --epoch-size 512 --batch-size 32 \
      --lr 6e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --save-every 50
  ;;
*)
  echo "unknown stage $1"; exit 2 ;;
esac
