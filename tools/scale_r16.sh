#!/bin/bash
# SCALE_r16 recording: Bench + ScaleCheck at sf0.1 and the ScaleGen x10
# fixture (/tmp/graft-sf1), TWO full runs each — the min-of-two protocol
# (per-label minimum) that makes round-over-round deltas trustworthy on
# this shared-CPU host. Run detached; logs under /tmp.
set -x
cd /root/repo
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_r16_$i.out 2>&1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.ScaleCheck /root/testdata/sf0.1" > /tmp/sc_sf01_r16_$i.out 2>&1
done
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_sf1_r16_$i.out 2>&1
  SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.ScaleCheck /tmp/graft-sf1" > /tmp/sc_sf1_r16_$i.out 2>&1
done
touch /tmp/scale_r16_done
