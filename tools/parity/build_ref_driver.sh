#!/bin/bash
# Build the reference library (out-of-tree, never modifying /root/reference)
# and the parity driver that links it. Artifacts go to /tmp/refbuild.
set -e
REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
HERE="$(cd "$(dirname "$0")" && pwd)"

if [ ! -f "$BUILD/libs/libucoslam.so" ]; then
  mkdir -p "$BUILD"
  cd "$BUILD"
  cmake "$REF" -DBUILD_GUI=OFF -DBUILD_UTILS=OFF -DBUILD_TESTS=OFF \
    -DCMAKE_BUILD_TYPE=Release >cmake.log 2>&1
  make -j"$(nproc)" ucoslam >make.log 2>&1
fi

OCV_CFLAGS=$(pkg-config --cflags opencv4)
OCV_LIBS=$(pkg-config --libs opencv4)
g++ -O2 -std=c++17 "$HERE/ref_driver.cpp" -o "$BUILD/ref_driver" \
  -I"$REF/src" -I"$REF/3rdparty" $OCV_CFLAGS \
  -L"$BUILD/libs" -lucoslam -Wl,-rpath,"$BUILD/libs" $OCV_LIBS
echo "built $BUILD/ref_driver"
