#!/usr/bin/env bash
# Single-host interactive run (reference interactive_train.sh role):
# one process, all locally-visible chips, short config by default.
set -euo pipefail
CONFIG="${1:-swin_73var_short}"
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export HDF5_USE_FILE_LOCKING=FALSE
export MALLOC_MMAP_THRESHOLD_="${MALLOC_MMAP_THRESHOLD_:-1073741824}"
export MALLOC_TRIM_THRESHOLD_="${MALLOC_TRIM_THRESHOLD_:-1073741824}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_xla}"
cd "$REPO_DIR"
exec python train.py --config="$CONFIG" --run_num="interactive"
