#!/bin/sh
# Full scale probe, one fresh JVM per section — a single-JVM run
# accumulates checkpoint blocks + GC pressure that distorts later
# sections (measured: P5/P8 3-6x outliers that vanish per-process).
set -e
cd "$(dirname "$0")/.."
for p in p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12 p13 p14 p15 p16 p17 p18; do
  python scripts/scale_probe.py --only=$p "$@"
done
