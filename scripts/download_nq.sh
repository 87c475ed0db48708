#!/usr/bin/env bash
# NQ-DPR raw-data fetch (the reference's download stage,
# dataprocess/NQ_dpr/download_data.sh).  Requires network access;
# air-gapped deployments stage these files into $DATA_DIR/raw out of
# band.
set -euo pipefail
DATA_DIR=${DATA_DIR:-data/nq_dpr}
mkdir -p $DATA_DIR/raw && cd $DATA_DIR/raw

# DPR wikipedia passages (21,015,324 rows; id, text, title)
wget -c https://dl.fbaipublicfiles.com/dpr/wikipedia_split/psgs_w100.tsv.gz
gzip -dkf psgs_w100.tsv.gz

# DPR biencoder training/dev data (positive passages per question)
wget -c https://dl.fbaipublicfiles.com/dpr/data/retriever/biencoder-nq-train.json.gz
gzip -dkf biencoder-nq-train.json.gz
wget -c https://dl.fbaipublicfiles.com/dpr/data/retriever/biencoder-nq-dev.json.gz
gzip -dkf biencoder-nq-dev.json.gz

# question + answer-set csvs (test evaluation answer matching)
wget -c https://dl.fbaipublicfiles.com/dpr/data/retriever/nq-dev.qa.csv
wget -c https://dl.fbaipublicfiles.com/dpr/data/retriever/nq-test.qa.csv
