#!/bin/bash
# Build the reference openHEVC decoder (golden oracle + CPU baseline).
# The reference tree is read-only, and cmake configure_file writes into the
# source dir (CMakeLists.txt:58-61), so we build from a /tmp copy.
# No yasm in this image -> pure-C build; generated config.h is patched to
# turn off all SIMD/inline-asm flags (the .asm objects are not assembled).
set -e
SRC=/tmp/ref_src
BUILD=/tmp/ref_build
if [ ! -f $BUILD/libLibOpenHevcWrapper.so ]; then
  [ -d $SRC ] || { cp -r /root/reference $SRC; chmod -R u+w $SRC; }
  mkdir -p $BUILD
  cd $BUILD
  cmake $SRC -DUSE_YASM=OFF -DCMAKE_BUILD_TYPE=Release > cmake.log 2>&1
  sed -i -E 's/#define (HAVE_(MMX2?|MMXEXT|SSE[0-9]*|SSE42|SSSE3|AVX2?|FMA[34]|XOP|AMD3DNOW(EXT)?)(_EXTERNAL|_INLINE)?) .*/#define \1 0/; s/#define (HAVE_[A-Z0-9_]*INLINE[A-Z0-9_]*) .*/#define \1 0/; s/#define (HAVE_(MMX|SSE)[A-Z0-9_]*_EXTERNAL) .*/#define \1 0/' $SRC/config.h
  make -j"$(nproc)" LibOpenHevcWrapper > build.log 2>&1
  gcc -shared -o libLibOpenHevcWrapper.so \
    -Wl,--whole-archive libLibOpenHevcWrapper.a -Wl,--no-whole-archive \
    -lpthread -lm
fi
echo "reference lib: $BUILD/libLibOpenHevcWrapper.so"
