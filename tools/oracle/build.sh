#!/bin/bash
# Build the reference oracle binaries with the reference's own optimization
# flags (CMakeLists.txt:4): -O3 -ftree-vectorize -ffast-math -march=native.
set -e
cd "$(dirname "$0")"
REF=${REF:-/root/reference/include}
FLAGS="-std=c++14 -O3 -ftree-vectorize -ffast-math -march=native -pthread"
INC="-Istub_include -I$REF"
mkdir -p bin
g++ $FLAGS $INC oracle_main.cpp -o bin/oracle_dynamic
g++ $FLAGS $INC -DORACLE_STATIC oracle_main.cpp -o bin/oracle_static
g++ $FLAGS $INC -DORACLE_MULTI oracle_main.cpp -o bin/oracle_multi
echo "built: $(ls bin)"
