#!/bin/sh
# Build the native dataset decoder shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    decoder.cpp -o libmindmap_runtime.so -lzstd -lpng -lpthread
echo "built $(pwd)/libmindmap_runtime.so"
