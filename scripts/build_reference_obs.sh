#!/bin/bash
# Build the reference MapCaller with the -obs/-obr debug call site
# re-enabled (VariantCalling.cpp:707 is commented out upstream), for
# byte-diffing our tools.py observe() output (VERDICT r2 next-9).
# Produces /tmp/refbuild_obs/src/MapCaller + test/RefIdx.
set -e
rm -rf /tmp/refbuild_obs
cp -r /root/reference /tmp/refbuild_obs
cd /tmp/refbuild_obs/src
sed -i 's|^\t//if (ObserveBegPos != -1) printf("Profile|\tif (ObserveBegPos != -1) printf("Profile|' VariantCalling.cpp
grep -n 'if (ObserveBegPos != -1) printf' VariantCalling.cpp
make -C BWT_Index libbwa.a > /dev/null
cat > hts_stub.c <<'STUB'
#include <stdlib.h>
void* sam_hdr_parse(int l, const char* t) { return calloc(1, 8); }
void* sam_hdr_init() { return calloc(1, 8); }
int sam_hdr_write(void* fp, const void* h) { return 0; }
void* bam_init1() { return calloc(1, 8); }
void bam_destroy1(void* b) { free(b); }
int sam_parse1(void* s, void* h, void* b) { return 0; }
int sam_write1(void* fp, const void* h, const void* b) { return 0; }
void* hts_open_format(const char* fn, const char* mode, const void* fmt) { return calloc(1, 8); }
int hts_close(void* fp) { return 0; }
int hts_parse_format(void* f, const char* s) { return 0; }
int hts_opt_add(void** opts, const char* c) { return 0; }
void hts_opt_free(void* opts) {}
int sam_hdr_change_HD(void* h, const char* key, const char* val) { return 0; }
void sam_hdr_destroy(void* h) {}
void bam_hdr_destroy(void* h) {}
STUB
g++ -w -D NDEBUG -O2 -m64 -msse4.1 -c *.cpp 2>/dev/null
gcc -O2 -c hts_stub.c -o hts_stub.o
g++ -O2 -m64 *.o BWT_Index/libbwa.a -o MapCaller -lz -lm -lpthread -lstdc++
echo "built: /tmp/refbuild_obs/src/MapCaller"
