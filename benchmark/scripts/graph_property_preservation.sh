#!/usr/bin/env bash
# Graph property preservation sweep
# (reference benchmark/scripts/graph_property_preservation.sh: with- and
# without-structure variants; here one tool handles both — methods with
# identity adjacency report the no-structure property subset).
set -e
cd "$(dirname "$0")/../.."

DATASETS=${DATASETS:-"cora citeseer"}
METHOD=${METHOD:-gcond}
EXTRA=${EXTRA:-""}

for d in $DATASETS; do
  echo "=== properties $METHOD $d ==="
  python benchmark/graph_property.py -M "$METHOD" -D "$d" $EXTRA \
    || echo "FAILED: properties $d"
done
