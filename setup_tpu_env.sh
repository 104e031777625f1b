#!/usr/bin/env bash
# Environment shim for nightcore_analyzer_tpu — the TPU-era analog of the
# reference's conda LD_LIBRARY_PATH fix (setup_conda_libcuda.sh): instead of
# patching dlopen paths for libcuda, it wires up the knobs the JAX/TPU stack
# actually needs.  Source it (don't execute):  source setup_tpu_env.sh
#
#   --cpu N   also force a virtual N-device CPU mesh (sharding tests/dev
#             boxes without TPU hardware)

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]:-$0}")" && pwd)"

# persistent XLA compile cache — first compile of a duration bucket is
# expensive; every later process reuses it
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$REPO_DIR/.jax_cache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

if [ "$1" = "--cpu" ]; then
    N="${2:-8}"
    export JAX_PLATFORMS=cpu
    case "$XLA_FLAGS" in
        *xla_force_host_platform_device_count*) ;;
        *) export XLA_FLAGS="$XLA_FLAGS --xla_force_host_platform_device_count=$N" ;;
    esac
    echo "virtual CPU mesh: $N devices"
fi

echo "JAX_COMPILATION_CACHE_DIR=$JAX_COMPILATION_CACHE_DIR"
echo "Run 'python -m nightcore_analyzer_tpu.verify_tpu' to verify the stack."
