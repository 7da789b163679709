#!/bin/bash
# Probe-gated round-7 perf campaign: --scaling first (the north-rule leg,
# ratio-sensitive), then bench run1, re-gate, bench run2.
# Gate thresholds reflect the measured host plateau this round (1p ~9-10
# MB/s, ratio 2.7-3.8 for >1h; the peak-state 1p>=12 gate never opened) —
# probe states are embedded in every output for normalization.
cd /root/repo
probe() { python3 -c "
import bench
p1 = bench._hw_probe(1); p4 = bench._hw_probe(4)
print(f'{p1} {p4} {p4/max(p1,0.01):.2f}')
"; }
gate() { # $1 = max wait seconds
  local waited=0
  while true; do
    read -r p1 p4 ratio <<< "$(probe)"
    echo "GATE probe: 1p=$p1 4p=$p4 ratio=$ratio waited=${waited}s" >&2
    ok=$(python3 -c "print(1 if float('$p1') >= 9.0 and float('$ratio') >= 3.0 else 0)")
    if [ "$ok" = "1" ]; then echo "GATE PASS" >&2; return 0; fi
    if [ "$waited" -ge "$1" ]; then echo "GATE TIMEOUT (running anyway)" >&2; return 1; fi
    sleep 90; waited=$((waited+90+16))
  done
}

echo "=== gate for scaling ===" >&2
gate 2400
echo "=== scaling ===" >&2
timeout 3000 python bench.py --scaling > /tmp/bench_r7_scaling.out 2>/tmp/bench_r7_scaling.err
echo "scaling rc=$?" >&2

echo "=== gate for bench run 1 ===" >&2
gate 2400
echo "=== bench run 1 ===" >&2
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout 2400 python bench.py > /tmp/bench_r7_run1.out 2>/tmp/bench_r7_run1.err
rc=$?
cp BENCH_local.json /tmp/BENCH_local_run1.json
echo "run1 rc=$rc" >&2

echo "=== gate for bench run 2 ===" >&2
gate 2400
echo "=== bench run 2 ===" >&2
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout 2400 python bench.py > /tmp/bench_r7_run2.out 2>/tmp/bench_r7_run2.err
rc=$?
cp BENCH_local.json /tmp/BENCH_local_run2.json
echo "run2 rc=$rc" >&2
echo DONE
