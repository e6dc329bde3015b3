#!/bin/bash
# Round-5 chain (from-scratch rebuild: the round-4 local_data/ checkpoints
# and datasets did not survive the machine, so every stage below starts at
# zero). Run stages individually: bash scripts/chains/r05.sh <stage>
# TPU training stages run under the stall-watchdog supervisor; eval stages
# log per-frame progress + per-phase timing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
SUP="$PY -m happypose_tpu.scripts.supervise"
DS=local_data/ds_r05
RUNS=local_data/runs_r05

case "${1:?stage}" in
# ------------------------------------------------------------- recording
record)
  # 4096 train frames (full DR, clean stored pixels) + 96 held-out frames
  # from the SAME written models + a 1024-frame clean split for the
  # learnability probe (the round-4 recipe, TRAINING_NOTES.md)
  $PY -m happypose_tpu.scripts.record_synthetic_dataset \
    --builtin-set r03 --out-dir $DS --n-frames 4096 --seed 0 \
    --write-models --wds --blur-sigma-max 0 --noise-std-max 0 \
    || exit 1
  $PY -m happypose_tpu.scripts.record_synthetic_dataset \
    --models-dir $DS/models --out-dir ${DS}_test --n-frames 96 --seed 777 \
    --blur-sigma-max 0 --noise-std-max 0 \
    || exit 1
  $PY -m happypose_tpu.scripts.record_synthetic_dataset \
    --models-dir $DS/models --out-dir ${DS}_clean --n-frames 1024 --seed 42 \
    --no-domain-rand --no-shadows --blur-sigma-max 0 --noise-std-max 0 \
    || exit 1
  ;;
# ------------------------------------------------------------- training
probe)
  # 150-epoch learnability probe on the clean split; its checkpoint
  # warm-starts the main refiner run
  $SUP --watch $RUNS/probe_clean/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/probe_clean --model-type refiner \
      --data ${DS}_clean --models-dir $DS/models \
      --epochs 150 --epoch-size 512 --batch-size 32 \
      --lr 6e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --eval-every 25 --save-every 20 --resume --no-augment
  ;;
refiner)
  # warm-started from the probe; 2nd refine iteration joins at epoch 400,
  # 3rd at 800 (stop early by killing: checkpoints every 20 epochs)
  $SUP --watch $RUNS/refiner/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/refiner --model-type refiner --data $DS \
      --models-dir $DS/models --epochs 1100 --epoch-size 512 --batch-size 32 \
      --lr 6e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --eval-every 25 --save-every 20 --resume \
      --add-iteration-epoch-interval 400 --n-iterations-max 3 \
      --init-from $RUNS/probe_clean
  ;;
coarse)
  # round-5 grid-negative protocol (the pipeline's actual ranking task;
  # the r04 multiview protocol ranked the grid at chance held-out)
  $SUP --watch $RUNS/coarse/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/coarse --model-type coarse --data $DS \
      --models-dir $DS/models --epochs 500 --epoch-size 512 --batch-size 32 \
      --lr 3e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --coarse-negatives grid --coarse-hypotheses 8 \
      --save-every 20 --resume
  ;;
detector)
  $SUP --watch $RUNS/detector/log.txt --stall-seconds 300 -- \
    $PY -m happypose_tpu.scripts.run_detector_training \
      --run-dir $RUNS/detector --split-dir $DS --models-dir $DS/models \
      --epochs 260 --epoch-size 512 --batch-size 16 --lr 1e-4 \
      --image-size 240 320 --save-every 10 --eval-interval 10 --resume
  ;;
# ---------------------------------------------------------------- evals
eval_fullstack_smoke)
  # 8-frame gt-detections smoke: bounds per-frame cost before the real runs
  $PY -m happypose_tpu.scripts.run_eval --split-dir ${DS}_test \
    --models-dir $DS/models --model from-checkpoints \
    --checkpoints $RUNS --detections gt --max-frames 8 \
    --bop19 --vsd-render-size 120 160 \
    --out-dir $RUNS/eval_fullstack_smoke
  ;;
eval_fullstack_gt)
  # full 96 held-out frames, gt detections (upper bound w/o detector)
  $PY -m happypose_tpu.scripts.run_eval --split-dir ${DS}_test \
    --models-dir $DS/models --model from-checkpoints \
    --checkpoints ${2:-$RUNS} --detections gt \
    --bop19 --vsd-render-size 120 160 \
    --out-dir ${3:-$RUNS/eval_fullstack_gt}
  ;;
eval_fullstack)
  # THE number: trained detector -> 576-grid coarse -> 5-iter refine ->
  # re-score -> BOP19 AR, 96 held-out frames
  $PY -m happypose_tpu.scripts.run_eval --split-dir ${DS}_test \
    --models-dir $DS/models --model from-checkpoints \
    --checkpoints ${2:-$RUNS} --detections detector \
    --detector-run ${3:-$RUNS/detector} --detection-th 0.3 \
    --bop19 --vsd-render-size 120 160 \
    --out-dir ${4:-$RUNS/eval_fullstack}
  ;;
eval_coarse)
  $PY -m happypose_tpu.scripts.eval_coarse_checkpoint \
    --coarse-dir ${2:-$RUNS/coarse} --split-dir ${DS}_test \
    --models-dir $DS/models --out ${3:-$RUNS/eval_coarse.json}
  ;;
eval_refiner)
  # both hand-off protocols: noised GT and grid-init (what the pipeline feeds)
  $PY -m happypose_tpu.scripts.eval_refiner_checkpoint \
    --run-dir ${2:-$RUNS/refiner} --split-dir ${DS}_test \
    --models-dir $DS/models --out ${3:-$RUNS/eval_refiner_noise.json}
  $PY -m happypose_tpu.scripts.eval_refiner_checkpoint \
    --run-dir ${2:-$RUNS/refiner} --split-dir ${DS}_test \
    --models-dir $DS/models --init-mode grid \
    --out ${4:-$RUNS/eval_refiner_grid.json}
  ;;
eval_mv)
  $PY -m happypose_tpu.scripts.run_multiview_eval \
    --out-dir $RUNS/eval_mv --record-dr 8 --n-views 6 \
    --models-dir $DS/models \
    --checkpoints $RUNS --ba-solver schur
  ;;
eval_det)
  $PY -m happypose_tpu.scripts.run_detection_eval \
    --split-dir ${DS}_test --models-dir $DS/models \
    --detector-run ${2:-$RUNS/detector} \
    --out-dir ${3:-$RUNS/eval_det} ${4:+--detection-th $4}
  ;;
# ------------------------------------------------------------ scale demo
record20k)
  # WDS recording for the streaming-at-scale demo
  $PY -m happypose_tpu.scripts.record_synthetic_dataset \
    --models-dir $DS/models --out-dir local_data/ds_r05_20k \
    --n-frames ${2:-20480} --seed 5 --wds --wds-only \
    --blur-sigma-max 0 --noise-std-max 0
  ;;
stream_train)
  # refiner short run from the WDS stream; compare step rate vs cached
  $SUP --watch $RUNS/stream_probe/log.txt --stall-seconds 600 -- \
    $PY -m happypose_tpu.scripts.run_pose_training \
      --run-dir $RUNS/stream_probe --model-type refiner \
      --data local_data/ds_r05_20k --models-dir $DS/models \
      --stream --epochs 30 --epoch-size 512 --batch-size 32 \
      --lr 6e-4 --bf16 --image-size 240 320 --render-size 120 160 \
      --save-every 50
  ;;
*)
  echo "unknown stage $1"; exit 2 ;;
esac
