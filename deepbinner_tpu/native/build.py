"""Build the native fast5 reader: ``python -m deepbinner_tpu.native.build``.

One g++ invocation linking the system libhdf5_serial — no cmake project
needed for a single translation unit, and the link step verifies the
hand-declared HDF5 ABI symbols actually resolve.
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    lib_dir = os.path.join(here, "lib")
    os.makedirs(lib_dir, exist_ok=True)

    def compile_one(src_name: str, out_name: str, extra: list) -> str:
        out = os.path.join(lib_dir, out_name)
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
            "-Wall", "-Wextra", "-Werror",
            "-o", out, os.path.join(here, "src", src_name),
            *extra,
            # Fail the build if any declared symbol doesn't resolve.
            "-Wl,--no-undefined",
        ]
        if verbose:
            print(" ".join(cmd), file=sys.stderr)
        subprocess.run(cmd, check=True)
        return out

    out = compile_one(
        "fast5_reader.cc", "libdeepbinner_fast5.so",
        # No dev package in this image: link the runtime soname directly.
        ["-l:libhdf5_serial.so.103"],
    )
    compile_one("vbz_decode.cc", "libdeepbinner_vbz.so", [])
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}", file=sys.stderr)
    # Smoke-test the bindings.
    from deepbinner_tpu.native import fast5_reader, vbz

    assert fast5_reader.available(), "library built but bindings failed to load"
    assert vbz.available(), "vbz library built but bindings failed to load"
    print("bindings load ok", file=sys.stderr)
