#!/bin/bash
# Build the reference C++ library (a patched copy — the fork's
# multi_special_primes.cpp assumes uint64_t == unsigned long long, which is
# false on LP64 Linux) and the interop oracle binary.
#
# Products: /tmp/refsrc (patched source copy), /tmp/refsrc/lib/libseal-3.5.a,
# /tmp/seal_oracle.
set -euo pipefail

REF=${REF:-/root/reference}
SRC=/tmp/refsrc
BUILD=/tmp/sealbuild
ORACLE=/tmp/seal_oracle
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"

if [ ! -f "$SRC/lib/libseal-3.5.a" ]; then
  rm -rf "$SRC" "$BUILD"
  cp -r "$REF" "$SRC"
  python3 - <<'EOF'
path = "/tmp/refsrc/native/src/seal/multi_special_primes.cpp"
src = open(path).read()
src = src.replace(
    "multiply_accumulate_uint64<1>(&op0, &op1, acc);",
    "multiply_accumulate_uint64<1>(&op0, &op1, reinterpret_cast<unsigned long long*>(acc));",
)
src = src.replace(
    "add_uint128(lazy_mult_ptr, qword, lazy_mult_ptr);",
    "add_uint128(reinterpret_cast<unsigned long long*>(lazy_mult_ptr), qword, reinterpret_cast<unsigned long long*>(lazy_mult_ptr));",
)
open(path, "w").write(src)
EOF
  mkdir -p "$BUILD"
  cd "$BUILD"
  cmake "$SRC" -DCMAKE_BUILD_TYPE=Release -DSEAL_USE_MSGSL=OFF -DSEAL_USE_ZLIB=OFF -G Ninja
  ninja -j"$(nproc)" seal
fi

g++ -O2 -std=c++17 -I"$SRC/native/src" -I"$BUILD/native/src" \
    "$SCRIPT_DIR/oracle.cpp" "$SRC/lib/libseal-3.5.a" -pthread \
    -o "$ORACLE"
echo "oracle built at $ORACLE"
