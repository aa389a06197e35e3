"""Build the native preprocessing library: ``python native/build.py``.

Produces ``native/libdspmap_native.so`` loaded by
``dspmap_tpu.io.native`` via ctypes (pure-Python fallbacks exist, so the
native build is an optimization, not a requirement).
"""

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent


def build() -> Path:
    out = HERE / "libdspmap_native.so"
    cmd = [
        "g++", "-O3", "-march=native", "-ffast-math", "-shared", "-fPIC",
        "-std=c++17",
        str(HERE / "preprocess.cpp"),
        "-o", str(out),
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print(build())
