#!/bin/sh
# Build the native helpers into birdnet_tpu/_native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../birdnet_tpu/_native
g++ -O3 -shared -fPIC -std=c++17 -o ../birdnet_tpu/_native/libwavio.so wavio.cpp
echo "built birdnet_tpu/_native/libwavio.so"
