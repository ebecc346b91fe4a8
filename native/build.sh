#!/bin/sh
# Build the native latent loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -pthread -std=c++17 -Wall \
    latent_loader.cpp -o liblatentloader.so
echo "built $(pwd)/liblatentloader.so"
