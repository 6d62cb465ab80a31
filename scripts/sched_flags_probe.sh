#!/bin/bash
# VERDICT r4 next-step #8: probe XLA latency-hiding / scheduler knobs at the
# flagship shape. The ledger attributes ~2.9 ms/step to in-program scheduling
# bubbles + unhidden DMA even in scanned mode (docs/FLAGSHIP_LEDGER.md
# §Analysis); this measures whether the public scheduler knobs move it.
#
# Delivery mechanism matters in this environment: XLA_FLAGS cannot carry
# TPU-backend flags (the axon client's local flag parser aborts on them:
# "Unknown flag in XLA_FLAGS: --xla_tpu_enable_latency_hiding_scheduler");
# per-compile compiler_options DO reach the remote compile service and are
# validated there (a bogus option name returns HTTP 500). So each variant
# passes a SCHED_OPTS JSON env that flagship_scan_bench.py forwards to
# .compile(compiler_options=...). Variants run SEQUENTIALLY — never two TPU
# processes at once.
set -u
cd /root/repo
declare -A VARIANTS=(
  [baseline]='null'
  [lhs]='{"xla_tpu_enable_latency_hiding_scheduler": "true"}'
  [vmem64m]='{"xla_tpu_scoped_vmem_limit_kib": "65536"}'
  [lhs_vmem64m]='{"xla_tpu_enable_latency_hiding_scheduler": "true", "xla_tpu_scoped_vmem_limit_kib": "65536"}'
)
ORDER=("$@")
if [ ${#ORDER[@]} -eq 0 ]; then ORDER=(lhs vmem64m lhs_vmem64m); fi
for name in "${ORDER[@]}"; do
  echo "=== variant: $name opts: ${VARIANTS[$name]} ==="
  SCHED_OPTS="${VARIANTS[$name]}" timeout 1800 python -u scripts/flagship_scan_bench.py \
    > "/tmp/sched_probe_${name}.log" 2>&1
  rc=$?
  echo "rc=$rc"
  tail -3 "/tmp/sched_probe_${name}.log"
done
echo "PROBE DONE"
