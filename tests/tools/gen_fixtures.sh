#!/bin/bash
# Regenerate golden fixtures from the upstream reference (requires the
# read-only reference checkout at /root/reference). The compiled reference
# objects are built out-of-tree in /tmp/refbuild.
set -euo pipefail

REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
HERE="$(cd "$(dirname "$0")" && pwd)"
GOLDEN="$HERE/../golden"

mkdir -p "$BUILD"
for f in nuc_cruc nuc_cruc_santa_lucia nuc_cruc_anchor nuc_cruc_output; do
    if [ ! -f "$BUILD/$f.o" ]; then
        g++ -O2 -std=c++14 -I"$REF" -c "$REF/$f.cpp" -o "$BUILD/$f.o"
    fi
done

g++ -O2 -std=c++14 -I"$REF" "$HERE/gen_reference_fixtures.cpp" \
    "$BUILD"/nuc_cruc.o "$BUILD"/nuc_cruc_santa_lucia.o \
    "$BUILD"/nuc_cruc_anchor.o "$BUILD"/nuc_cruc_output.o \
    -o "$BUILD/gen_fixtures"

"$BUILD/gen_fixtures" "$GOLDEN/melt_fixtures.json"
