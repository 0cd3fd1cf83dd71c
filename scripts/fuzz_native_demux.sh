#!/bin/bash
# Build and run the ASAN+UBSAN fuzz driver for the native fMP4 layer.
# Usage: scripts/fuzz_native_demux.sh [seed] [iterations]
set -e
cd "$(dirname "$0")/.."
g++ -O1 -g -fsanitize=address,undefined -std=c++17 \
    scripts/fuzz_native_demux.cc foveax/native/fmp4.cc \
    -o /tmp/fuzz_native_demux
exec /tmp/fuzz_native_demux "${1:-0}" "${2:-200}"
