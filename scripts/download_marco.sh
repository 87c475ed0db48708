#!/usr/bin/env bash
# MS MARCO passage raw-data fetch (the reference's download_data.sh
# stage, dataprocess/msmarco_passage/download_data.sh:1-16).
# Requires network access; air-gapped deployments stage these files
# into $DATA_DIR/raw out of band.
set -euo pipefail
DATA_DIR=${DATA_DIR:-data/marco}
mkdir -p $DATA_DIR/raw && cd $DATA_DIR/raw

# rocketqa-corpus tarball: para.txt + para.title.txt + queries + qrels
wget -c https://rocketqa.bj.bcebos.com/corpus/marco.tar.gz
tar -zxf marco.tar.gz && mv marco/* . && rmdir marco

# join title + paragraph into corpus.tsv (docid \t title \t text)
paste para.title.txt para.txt | awk -F'\t' '{print $1"\t"$2"\t"$4}' \
    > corpus.tsv

# BM25 negatives for hard-negative training variants
wget -c https://msmarco.z22.web.core.windows.net/msmarcoranking/qidpidtriples.train.full.2.tsv.gz
gunzip -k qidpidtriples.train.full.2.tsv.gz
awk -v RS='\r\n' '$1==last1 && NR-last2<=200 {printf "%s\n", $3} \
    {last1=$1; last2=NR}' qidpidtriples.train.full.2.tsv \
    > train.negatives.tsv
