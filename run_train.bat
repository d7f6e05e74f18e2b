@echo off
REM Windows variant of run_train.sh (reference parity: run_train.bat)
python -m vit_deep_radiomics_tpu.cli.train -a transformer -d stanford -m petct -l crossmodal -e petct
python -m vit_deep_radiomics_tpu.cli.train -a transformer -d santa_maria -m petct -l crossmodal -e petct
