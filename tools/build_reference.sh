#!/bin/bash
# Build the UNMODIFIED reference engine against the Qt stubs and produce the
# golden-state generator.  M is the reference's compile-time particle-count
# macro: N = M * 1024 (/root/reference/src/sph.cpp:29-31,59).
set -euo pipefail
cd "$(dirname "$0")"

M="${1:-4}"          # default 4 -> 4096 particles (parity runs)
OUT="${2:-golden_gen_m$M}"

g++ -O3 -ffast-math -march=native -mavx -mfma -funroll-loops \
    -DM="$M" \
    -I qtstub -I /root/reference/src \
    -o "$OUT" \
    golden_main.cpp \
    /root/reference/src/sph.cpp \
    /root/reference/src/particle.cpp \
    /root/reference/src/vec3.cpp

echo "built $OUT (N=$((M * 1024)) particles)"
