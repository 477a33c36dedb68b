#!/bin/bash
# Build the native host-pipeline library (see fastops.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC fastops.cpp -o libfastops.so
echo "built $(pwd)/libfastops.so"
