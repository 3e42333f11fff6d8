#!/bin/bash
# On-chip kernel test runner.
#
# Fast tier (default, <5 min with a warm persistent compile cache at
# .jax_cache; first cold run ~8 min): one parametrization per kernel
# code path — packed/mixed-width windowed GEMM, strided conv, subm VJP,
# bev_pool pallas kernel.
#
#   tools/run_tpu_tests.sh            # fast tier
#   tools/run_tpu_tests.sh --full     # + slow tier (all widths, strided
#                                     # VJP, full encoder engine parity)
#
# Serialize with anything else using the chip: the host is single-core
# and the axon tunnel admits one process.
set -e
cd "$(dirname "$0")/.."
MARK='not slow'
if [ "$1" = "--full" ]; then MARK=''; fi
BEVF_TEST_TPU=1 python -m pytest \
  tests/test_sparse_conv_windowed.py tests/test_bev_pool_pallas.py \
  ${MARK:+-m "$MARK"} -q "${@:2}"
