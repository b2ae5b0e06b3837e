#!/bin/bash
# Run the full test suite (numerics parity, loaders, e2e train slice,
# Pallas kernel equivalence) on a virtual 8-device CPU mesh.
cd "$(dirname "$0")/.." || exit 1
python -m pytest tests/ -q "$@"
