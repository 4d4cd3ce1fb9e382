#!/bin/bash
# Third full pass of the SCALE_r16 record, taken at the FINAL round-16
# HEAD (after the token-count/q92 batch). merge_scale_r16.py min-merges
# passes 1..3 per entry.
set -x
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_r16_3.out 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.ScaleCheck /root/testdata/sf0.1" > /tmp/sc_sf01_r16_3.out 2>&1
SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1_r16_3.out 2>&1
SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.ScaleCheck /tmp/graft-sf1" > /tmp/sc_sf1_r16_3.out 2>&1
touch /tmp/scale_r16_pass3_done
