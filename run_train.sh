#!/usr/bin/env bash
# Experiment sweep: arch × dataset × modality × loss.
# Capability-equivalent of the reference's run_train.sh (sequential
# sweep of train_models.py invocations); same experiment grid.
set -euo pipefail

TRAIN="python -m vit_deep_radiomics_tpu.cli.train"

$TRAIN -a conv        -d stanford    -m pet   -l focal      -e petct
$TRAIN -a conv        -d stanford    -m ct    -l focal      -e petct
$TRAIN -a conv        -d santa_maria -m pet   -l focal      -e petct
$TRAIN -a conv        -d santa_maria -m ct    -l focal      -e petct
$TRAIN -a transformer -d stanford    -m pet   -l focal      -e petct
$TRAIN -a transformer -d stanford    -m ct    -l focal      -e petct
$TRAIN -a transformer -d santa_maria -m pet   -l focal      -e petct
$TRAIN -a transformer -d santa_maria -m ct    -l focal      -e petct
$TRAIN -a transformer -d stanford    -m petct -l crossmodal -e petct
$TRAIN -a transformer -d santa_maria -m petct -l crossmodal -e petct
