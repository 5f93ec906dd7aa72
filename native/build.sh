#!/bin/sh
# Build the native host-side library. Output lands next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    mudg_native.cpp -o libmudg_native.so
echo "built $(pwd)/libmudg_native.so"
