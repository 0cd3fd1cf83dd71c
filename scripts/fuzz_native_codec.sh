#!/bin/bash
# Build and run the ASAN+UBSAN fuzz driver for the native codec shim.
# Usage: scripts/fuzz_native_codec.sh [seed] [iterations]
set -e
cd "$(dirname "$0")/.."
g++ -O1 -g -fsanitize=address,undefined -std=c++17 \
    scripts/fuzz_native_codec.cc foveax/native/codec.cc \
    -o /tmp/fuzz_native_codec -lavcodec -lavutil -lswscale
exec /tmp/fuzz_native_codec "${1:-0}" "${2:-40}"
