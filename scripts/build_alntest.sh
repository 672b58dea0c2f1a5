#!/bin/bash
# Build the reference-aligner fuzz harness at /tmp/alntest: feeds
# "s1 s2" lines to the reference's nw_alignment / ksw2_alignment
# (tests/test_aligners.py compares our host oracles against it).
set -e
DIR=$(mktemp -d)
cp /root/reference/src/nw_alignment.cpp /root/reference/src/ksw2_alignment.cpp \
   /root/reference/src/structure.h "$DIR"/
cat > "$DIR/main.cpp" <<'CPP'
#include <iostream>
#include <string>
using namespace std;
// referenced by the aligners (defined in bntseq.c in the full build)
unsigned char nst_nt4_table[256];
struct _init { _init() {
    for (int i = 0; i < 256; i++) nst_nt4_table[i] = 4;
    nst_nt4_table['A'] = 0; nst_nt4_table['C'] = 1;
    nst_nt4_table['G'] = 2; nst_nt4_table['T'] = 3;
    nst_nt4_table['a'] = 0; nst_nt4_table['c'] = 1;
    nst_nt4_table['g'] = 2; nst_nt4_table['t'] = 3;
} } _ii;
extern void nw_alignment(int m, string& s1, int n, string& s2);
extern void ksw2_alignment(int m, string& s1, int n, string& s2);
int main(int argc, char** argv) {
    bool nw = string(argv[1]) == "nw";
    string a, b;
    while (cin >> a >> b) {
        if (nw) nw_alignment((int)a.size(), a, (int)b.size(), b);
        else ksw2_alignment((int)a.size(), a, (int)b.size(), b);
        cout << a << " " << b << "\n";
    }
    return 0;
}
CPP
cd "$DIR"
g++ -O2 -msse4.1 -o /tmp/alntest main.cpp nw_alignment.cpp ksw2_alignment.cpp
echo "built /tmp/alntest"
