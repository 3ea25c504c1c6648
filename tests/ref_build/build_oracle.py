"""Build the reference's cpp_subsampling extension out-of-tree as a test
oracle (reference: cpp_wrappers/cpp_subsampling/{wrapper.cpp,setup.py}).

The reference sources are compiled UNMODIFIED from /root/reference; the only
addition is a force-included shim header (npy_compat_shim.h) adapting the
pre-1.7 numpy C API the wrapper was written against to numpy 2.x. The built
.so lands next to this file and is git-ignored — tests build it on demand.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

REF = "/root/reference/cpp_wrappers"
HERE = os.path.dirname(os.path.abspath(__file__))


def oracle_path() -> str:
    return os.path.join(
        HERE, "grid_subsampling" + sysconfig.get_config_var("EXT_SUFFIX"))


def build_oracle(force: bool = False) -> str | None:
    """Compile the oracle if missing; returns the .so path or None."""
    import numpy as np

    out = oracle_path()
    srcs = [f"{REF}/cpp_utils/cloud/cloud.cpp",
            f"{REF}/cpp_subsampling/grid_subsampling/grid_subsampling.cpp",
            f"{REF}/cpp_subsampling/wrapper.cpp"]
    if not force and os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    if not all(os.path.exists(s) for s in srcs):
        return None
    cmd = ["g++", "-shared", "-fPIC", "-O2", "-std=c++11", "-w",
           "-include", os.path.join(HERE, "npy_compat_shim.h"),
           f"-I{np.get_include()}",
           f"-I{sysconfig.get_paths()['include']}",
           f"-I{REF}/cpp_subsampling", *srcs, "-o", out]
    try:
        subprocess.check_call(cmd)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return out


def load_oracle():
    """Import the built extension; returns the module or None."""
    if build_oracle() is None:
        return None
    import importlib.util

    # name must match the extension's PyInit_grid_subsampling symbol
    spec = importlib.util.spec_from_file_location(
        "grid_subsampling", oracle_path())
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


if __name__ == "__main__":
    print(build_oracle(force=True))
