#!/usr/bin/env bash
# Multi-host TPU pod launcher — the TPU-native counterpart of the
# reference's Slurm stack (submit_batch.sh / export_DDP_vars.sh).
#
# On a TPU pod slice there is no per-GPU process spawn and no NCCL
# rendezvous: ONE process per HOST drives all local chips, and
# jax.distributed discovers the slice topology from the TPU runtime. This
# script is what each host runs (e.g. via `gcloud compute tpus tpu-vm ssh
# --worker=all --command="bash launch/train_pod.sh <config>"`).
#
# For generic clusters (no TPU metadata service), export the coordinator
# explicitly before launch; parallel/mesh.py picks these up:
#   COORDINATOR_ADDRESS=host0:8476  NPROCS=<num_hosts>  PROCESS_ID=<rank>

set -euo pipefail

# Graceful preemption: the trainer checkpoints at the next step boundary
# and exits cleanly on SIGTERM/SIGUSR1 (training/preempt.py). Under Slurm,
# request a warning signal (e.g. `#SBATCH --signal=B:USR1@120`); on GCP,
# TPU maintenance events deliver SIGTERM to the process automatically.

CONFIG="${1:-swin_73var_geo_depth12_chweight_invar}"
RUN_NUM="${2:-00}"
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

# HDF5 archives are read-only and shared across hosts: no file locking
export HDF5_USE_FILE_LOCKING=FALSE
# keep glibc from unmapping/remapping the input pipeline's large buffers:
# first-touch page faults on fresh anonymous mappings cost ~100 us/fault on
# some kernels (measured; see ROADMAP 'input pipeline'), so big buffers must
# be allocated once and reused. The loader pools its batch buffers; these
# tunables extend the same guarantee to every other large allocation.
export MALLOC_MMAP_THRESHOLD_="${MALLOC_MMAP_THRESHOLD_:-1073741824}"
export MALLOC_TRIM_THRESHOLD_="${MALLOC_TRIM_THRESHOLD_:-1073741824}"
# bind host memory allocations for the input pipeline to local NUMA nodes
export TPU_HOST_BOUNDS="${TPU_HOST_BOUNDS:-}"
# persistent XLA compile cache shared across restarts of the same pod job
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_xla}"

cd "$REPO_DIR"
exec python train.py --config="$CONFIG" --run_num="$RUN_NUM"
