#!/bin/sh
# Build the native runtime library into native/build/libdem_native.so.
# Falls back to a direct g++ invocation if cmake/ninja are unavailable.
set -e
cd "$(dirname "$0")"
if command -v cmake >/dev/null 2>&1; then
  cmake -S . -B build -G Ninja -DCMAKE_BUILD_TYPE=Release >/dev/null 2>&1 \
    || cmake -S . -B build -DCMAKE_BUILD_TYPE=Release
  cmake --build build
else
  mkdir -p build
  g++ -std=c++17 -O3 -shared -fPIC dem_native.cpp -o build/libdem_native.so
fi
echo "built: $(ls build/libdem_native.so)"
