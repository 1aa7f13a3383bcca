#!/bin/sh
# Build the native ingest library into the python package tree.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o ../rtnr_tpu/data/_rtnr_ingest.so rtnr_ingest.cpp rtnr_e57.cpp
echo "built rtnr_tpu/data/_rtnr_ingest.so"
