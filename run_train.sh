#!/usr/bin/env bash
# Experiment sweep: arch × dataset × modality × loss.
# Capability-equivalent of the reference's run_train.sh (sequential
# sweep of train_models.py invocations); same experiment grid, but run
# IN ONE PROCESS so compiled step executables are shared across
# experiments (each remote compile costs ~50 s and cannot be cached
# across processes — docs/ROADMAP.md §5c).
#
# Per-experiment equivalent (what the reference's script does):
#   python -m vit_deep_radiomics_tpu.cli.train -a conv -d stanford -m pet -l focal -e petct
#   ... (× 10, see vit_deep_radiomics_tpu/cli/sweep.py GRID)
set -euo pipefail

python -m vit_deep_radiomics_tpu.cli.sweep -e petct "$@"
