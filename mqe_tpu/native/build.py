"""Build the native host-side kernels: python -m mqe_tpu.native.build"""
import sys

from mqe_tpu.native import _SO, build

if __name__ == "__main__":
    ok = build(verbose=True)
    print(f"built {_SO}" if ok else "build FAILED")
    sys.exit(0 if ok else 1)
