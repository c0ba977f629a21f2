#!/bin/sh
# Build the native helpers into native/libhalo2native.so
set -e
cd "$(dirname "$0")"
cc -O3 -fPIC -shared -o libhalo2native.so keccak.c
echo "built $(pwd)/libhalo2native.so"
