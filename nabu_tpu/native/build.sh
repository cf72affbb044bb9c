#!/bin/bash
# Build the native scoring library. Called automatically (and lazily)
# by nabu_tpu.native on first use; safe to re-run.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libnabu_native.so \
    edit_distance.cc fbank.cc
