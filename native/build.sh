#!/usr/bin/env bash
# Build the native data-path library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -fopenmp -o librangeview_io.so rangeview_io.cpp
echo "built $(pwd)/librangeview_io.so"
