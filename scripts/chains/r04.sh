#!/bin/bash
# Round-4 main chain. Run stages individually: bash run_r04_chain.sh <stage>
# All TPU stages run under the stall-watchdog supervisor and are resumable.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
SUP="$PY -m happypose_tpu.scripts.supervise"
DS=local_data/ds_r04
RUNS=local_data/runs_r04

case "${1:?stage}" in
record)
  $PY -m happypose_tpu.scripts.record_synthetic_dataset \
    --builtin-set r03 --out-dir $DS --n-frames 4096 --seed 0 \
    --write-models --wds --blur-sigma-max 0 --noise-std-max 0 \
    || exit 1
  $PY -m happypose_tpu.scripts.record_synthetic_dataset \
    --models-dir $DS/models --out-dir ${DS}_test --n-frames 96 --seed 777 \
    --blur-sigma-max 0 --noise-std-max 0 \
    || exit 1
  ;;
probe)
  # 150-epoch learnability probe on the clean textured-model split; its
  # checkpoint warm-starts the main refiner run (escape the zero-update
  # plateau on easy data first)
  $SUP --watch $RUNS/probe_clean/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/probe_clean --model-type refiner \
      --data local_data/ds_abl_clean2 \
      --models-dir local_data/ds_abl_clean2/models \
      --epochs 150 --epoch-size 512 --batch-size 32 \
      --lr 6e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --eval-every 25 --save-every 20 --resume --no-augment
  ;;
refiner)
  $SUP --watch $RUNS/refiner/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/refiner --model-type refiner --data $DS \
      --models-dir $DS/models --epochs 650 --epoch-size 512 --batch-size 32 \
      --lr 6e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --eval-every 25 --save-every 20 --resume \
      --add-iteration-epoch-interval 400 --n-iterations-max 2 \
      --init-from $RUNS/probe_clean
  ;;
coarse)
  $SUP --watch $RUNS/coarse/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/coarse --model-type coarse --data $DS \
      --models-dir $DS/models --epochs 400 --epoch-size 512 --batch-size 32 \
      --lr 3e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --save-every 20 --resume
  ;;
detector)
  $SUP --watch $RUNS/detector/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_detector_training \
      --run-dir $RUNS/detector --split-dir $DS --models-dir $DS/models \
      --epochs 120 --epoch-size 512 --batch-size 16 --lr 1e-4 \
      --image-size 240 320 --save-every 10 --eval-interval 10 --resume
  ;;
eval_det)
  $PY -m happypose_tpu.scripts.run_detection_eval \
    --split-dir ${DS}_test --models-dir $DS/models --detector-run $RUNS/detector \
    --out-dir $RUNS/eval_det ${2:+--detection-th $2}
  ;;
eval_coarse)
  $PY -m happypose_tpu.scripts.eval_coarse_checkpoint \
    --coarse-dir $RUNS/coarse --split-dir ${DS}_test \
    --models-dir $DS/models --out $RUNS/eval_coarse.json
  ;;
eval_fullstack)
  $PY -m happypose_tpu.scripts.run_eval --split-dir ${DS}_test \
    --models-dir $DS/models --model from-checkpoints \
    --checkpoints $RUNS --detections detector \
    --detector-run $RUNS/detector --detection-th 0.3 \
    --bop19 --vsd-render-size 120 160 \
    --out-dir $RUNS/eval_fullstack
  ;;
eval_mv)
  $PY -m happypose_tpu.scripts.run_multiview_eval \
    --out-dir $RUNS/eval_mv --record-dr 8 --n-views 6 \
    --checkpoints $RUNS --ba-solver schur
  ;;
*)
  echo "unknown stage $1"; exit 2 ;;
esac
