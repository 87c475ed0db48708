#!/usr/bin/env bash
# MS MARCO passage raw-data fetch + prep (the reference's
# download_data.sh stage, dataprocess/msmarco_passage/download_data.sh:
# 1-16).  Downloads are skipped for files already present, so
# air-gapped deployments (and the fixture test) stage files into
# $DATA_DIR/raw out of band and re-run this script for the prep steps.
set -euo pipefail
DATA_DIR=${DATA_DIR:-data/marco}
mkdir -p "$DATA_DIR/raw" && cd "$DATA_DIR/raw"

fetch() {  # fetch <url> <out>: skip when staged locally
    [ -s "$2" ] || wget --no-check-certificate -O "$2" "$1"
}

# rocketqa-corpus tarball: para.txt + para.title.txt + queries + qrels
if [ ! -s para.txt ]; then
    fetch https://rocketqa.bj.bcebos.com/corpus/marco.tar.gz marco.tar.gz
    tar -zxf marco.tar.gz && mv marco/* . && rmdir marco \
        && rm -f marco.tar.gz
fi
if [ ! -s qidpidtriples.train.full.2.tsv ]; then
    fetch https://msmarco.blob.core.windows.net/msmarcoranking/qidpidtriples.train.full.2.tsv.gz \
        qidpidtriples.train.full.2.tsv.gz
    gunzip -k qidpidtriples.train.full.2.tsv.gz
fi
fetch https://msmarco.blob.core.windows.net/msmarcoranking/qrels.train.tsv \
    qrels.train.tsv

# corpus.tsv (docid \t title \t text): LEFT join of paragraphs with
# titles (passages without a title keep an empty field), re-sorted
# numerically — byte-for-byte the reference recipe
# (download_data.sh:14)
join -t "$(echo -en '\t')" -e '' -a 1 -o 1.1 2.2 1.2 \
    <(sort -k1,1 para.txt) <(sort -k1,1 para.title.txt) \
    | sort -k1,1 -n > corpus.tsv

# train.negatives.tsv (qid \t pid,pid,...): group the BM25 triples'
# negative pids per query (download_data.sh:15)
awk -v RS='\r\n' '$1==last {printf ",%s",$3; next}
    NR>1 {print "";} {last=$1; printf "%s\t%s",$1,$3;} END{print "";}' \
    qidpidtriples.train.full.2.tsv > train.negatives.tsv
