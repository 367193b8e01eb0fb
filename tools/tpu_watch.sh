#!/bin/sh
# Opportunistic TPU bench watcher: probe the tunneled chip every ~2 min;
# the moment the link is healthy, run the device benchmark suite
# (tools/tpu_device_bench.py).  Logs under bench_work/watch/.
cd /root/repo || exit 1
mkdir -p bench_work/watch
while true; do
  ts=$(date +%Y%m%d_%H%M%S)
  if timeout 110 python tools/tpu_probe.py \
      >> bench_work/watch/probes.jsonl 2>> bench_work/watch/probe_err.log; then
    echo "$ts healthy - running pallas probe" >> bench_work/watch/watch.log
    timeout 900 python tools/tpu_pallas_probe.py \
      > "bench_work/watch/pallas_$ts.jsonl" \
      2> "bench_work/watch/pallas_$ts.err"
    echo "$ts pallas probe done rc=$?" >> bench_work/watch/watch.log
    timeout 2400 python tools/tpu_device_bench.py \
      > "bench_work/watch/device_$ts.jsonl" \
      2> "bench_work/watch/device_$ts.err"
    echo "$ts device bench done rc=$?" >> bench_work/watch/watch.log
    sleep 60
  else
    sleep 110
  fi
done
