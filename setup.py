"""Build hook: compile the native host runtime into the package.

The reference installs via CMake (/root/reference/CMakeLists.txt:116-123);
here `pip install .` compiles native/gfdm_host.cpp to
gfdm_tpu/native/libgfdm_host.so before packaging. If no C++ toolchain is
available the install still succeeds — the ctypes wrapper falls back to
NumPy implementations (gfdm_tpu/native/__init__.py).
"""
import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildNativeThenPy(build_py):
    def run(self):
        root = Path(__file__).parent
        src = root / "native" / "gfdm_host.cpp"
        out = root / "gfdm_tpu" / "native" / "libgfdm_host.so"
        cxx = shutil.which("g++") or shutil.which("clang++")
        if src.exists() and cxx is not None:
            if not out.exists() or src.stat().st_mtime > out.stat().st_mtime:
                cmd = [
                    cxx, "-O3", "-std=c++17", "-fPIC", "-Wall", "-Wextra",
                    "-pthread", "-shared", "-o", str(out), str(src),
                ]
                print("building native runtime:", " ".join(cmd))
                subprocess.run(cmd, check=True)
        elif not out.exists():
            print(
                "warning: no C++ compiler found; installing without the "
                "native host runtime (NumPy fallbacks will be used)"
            )
        super().run()


setup(cmdclass={"build_py": BuildNativeThenPy})
